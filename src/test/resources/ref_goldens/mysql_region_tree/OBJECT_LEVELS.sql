-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.375475                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;


/*!40000 ALTER TABLE `OBJECT_LEVELS` DISABLE KEYS */;
INSERT INTO `OBJECT_LEVELS` (`LEVEL`, `NAME`, `SHORTNAME`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTIVE`) VALUES 
	("25", 1, "с.Ильинка", "2023-10-20", "2022-12-12", "2024-07-26", 1),
	("90", "Plain", "Tab	Sep", "2024-11-09", "2024-07-23", "2023-04-04", 0),
	("73", "ул. Мира", "Красный Яр \"Южный\"", "2022-05-17", "2022-09-25", "2023-04-01", 0);
/*!40000 ALTER TABLE `OBJECT_LEVELS` ENABLE KEYS */;

/*!40101 SET SQL_MODE=IFNULL(@OLD_SQL_MODE, '') */;
/*!40014 SET FOREIGN_KEY_CHECKS=IF(@OLD_FOREIGN_KEY_CHECKS IS NULL, 1, @OLD_FOREIGN_KEY_CHECKS) */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
