-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.583566                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

-- Region: `01`, Table: `CHANGE_HISTORY`

/*!40000 ALTER TABLE `CHANGE_HISTORY` DISABLE KEYS */;
INSERT INTO `CHANGE_HISTORY` (`CHANGEID`, `OBJECTID`, `ADROBJECTID`, `OPERTYPEID`, `NDOCID`, `CHANGEDATE`) VALUES 
	("100000", "100001", "с.Ильинка", "570025", "100004", "2021-10-08"),
	("100031", "100032", "О'Хара", "696631", "100035", "2025-01-31"),
	("100062", "100063", 1, "242636", "100066", "2024-03-15");
/*!40000 ALTER TABLE `CHANGE_HISTORY` ENABLE KEYS */;

-- Region: `77`, Table: `CHANGE_HISTORY`

/*!40000 ALTER TABLE `CHANGE_HISTORY` DISABLE KEYS */;
/*!40000 ALTER TABLE `CHANGE_HISTORY` ENABLE KEYS */;

/*!40101 SET SQL_MODE=IFNULL(@OLD_SQL_MODE, '') */;
/*!40014 SET FOREIGN_KEY_CHECKS=IF(@OLD_FOREIGN_KEY_CHECKS IS NULL, 1, @OLD_FOREIGN_KEY_CHECKS) */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
