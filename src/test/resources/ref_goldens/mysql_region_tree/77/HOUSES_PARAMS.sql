-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.383515                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

-- Region: `77`, Table: `HOUSES_PARAMS`

/*!40000 ALTER TABLE `HOUSES_PARAMS` DISABLE KEYS */;
INSERT INTO `HOUSES_PARAMS` (`ID`, `OBJECTID`, `CHANGEID`, `CHANGEIDEND`, `TYPEID`, `VALUE`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`) VALUES 
	("100000", "100001", "100002", "100003", "33476", 1, "2024-09-26", "2023-04-15", "2022-07-27"),
	("100031", "100032", "100033", "100034", "11854", "Plain", "2024-04-05", "2022-10-14", "2021-11-09"),
	("100062", "100063", "100064", "100065", "617922", "О'Хара", "2021-04-02", "2022-10-28", "2023-04-21"),
	("100093", "100094", "100095", "100096", "213974", "Красный Яр \"Южный\"", "2022-03-09", "2024-03-19", "2021-01-31");
/*!40000 ALTER TABLE `HOUSES_PARAMS` ENABLE KEYS */;

/*!40101 SET SQL_MODE=IFNULL(@OLD_SQL_MODE, '') */;
/*!40014 SET FOREIGN_KEY_CHECKS=IF(@OLD_FOREIGN_KEY_CHECKS IS NULL, 1, @OLD_FOREIGN_KEY_CHECKS) */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
