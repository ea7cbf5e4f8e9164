-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.806741                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

-- Table: `HOUSE_TYPES`

/*!40000 ALTER TABLE `HOUSE_TYPES` DISABLE KEYS */;
INSERT INTO `HOUSE_TYPES` (`ID`, `NAME`, `SHORTNAME`, `DESC`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTIVE`) VALUES 
	("205693", "Николаевка", "Николаевка", 1, "2022-08-09", "2022-04-18", "2024-07-12", 1),
	("44167", "с.Ильинка", "О'Хара", NULL, "2023-01-02", "2023-01-11", "2021-07-22", 1),
	("938558", "Красный Яр \"Южный\"", "Николаевка", "Tab	Sep", "2025-01-24", "2021-09-15", "2021-02-11", 0);
/*!40000 ALTER TABLE `HOUSE_TYPES` ENABLE KEYS */;

/*!40101 SET SQL_MODE=IFNULL(@OLD_SQL_MODE, '') */;
/*!40014 SET FOREIGN_KEY_CHECKS=IF(@OLD_FOREIGN_KEY_CHECKS IS NULL, 1, @OLD_FOREIGN_KEY_CHECKS) */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
