-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.380361                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

-- Region: `01`, Table: `HOUSES_PARAMS`

/*!40000 ALTER TABLE `HOUSES_PARAMS` DISABLE KEYS */;
INSERT INTO `HOUSES_PARAMS` (`ID`, `OBJECTID`, `CHANGEID`, `CHANGEIDEND`, `TYPEID`, `VALUE`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`) VALUES 
	("100000", "100001", NULL, "100003", "170942", 1, "2023-05-10", "2021-03-13", "2021-05-26"),
	("100031", "100032", "100033", "100034", "110478", "пос. Зелёный, д.7", "2021-06-05", "2021-02-18", "2024-02-23"),
	("100062", "100063", "100064", "100065", "864827", "Back\\slash", "2024-12-07", "2021-11-01", "2023-07-28"),
	("100093", "100094", "100095", "100096", "174851", "ул. Мира", "2024-10-02", "2022-08-01", "2021-04-27");
/*!40000 ALTER TABLE `HOUSES_PARAMS` ENABLE KEYS */;

/*!40101 SET SQL_MODE=IFNULL(@OLD_SQL_MODE, '') */;
/*!40014 SET FOREIGN_KEY_CHECKS=IF(@OLD_FOREIGN_KEY_CHECKS IS NULL, 1, @OLD_FOREIGN_KEY_CHECKS) */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
