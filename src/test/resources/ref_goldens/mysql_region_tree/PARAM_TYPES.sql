-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.376653                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;


/*!40000 ALTER TABLE `PARAM_TYPES` DISABLE KEYS */;
INSERT INTO `PARAM_TYPES` (`ID`, `NAME`, `CODE`, `DESC`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTIVE`) VALUES 
	("185623", "Back\\slash", "Красный Яр \"Южный\"", "пос. Зелёный, д.7", "2021-01-24", "2023-04-24", "2022-04-28", 1),
	("423748", "с.Ильинка", "Back\\slash", "О'Хара", "2024-11-21", "2024-09-09", "2022-09-09", 0),
	("656097", "ул. Мира", "пос. Зелёный, д.7", "О'Хара", "2021-07-02", "2021-12-11", "2022-06-29", 1);
/*!40000 ALTER TABLE `PARAM_TYPES` ENABLE KEYS */;

/*!40101 SET SQL_MODE=IFNULL(@OLD_SQL_MODE, '') */;
/*!40014 SET FOREIGN_KEY_CHECKS=IF(@OLD_FOREIGN_KEY_CHECKS IS NULL, 1, @OLD_FOREIGN_KEY_CHECKS) */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
