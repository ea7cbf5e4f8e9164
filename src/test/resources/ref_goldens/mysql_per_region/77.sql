-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.812962                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

-- Region: `77`, Table: `ADDR_OBJ`

/*!40000 ALTER TABLE `ADDR_OBJ` DISABLE KEYS */;
INSERT INTO `ADDR_OBJ` (`ID`, `OBJECTID`, `OBJECTGUID`, `CHANGEID`, `NAME`, `TYPENAME`, `LEVEL`, `OPERTYPEID`, `PREVID`, `NEXTID`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTUAL`, `ISACTIVE`) VALUES 
	("100000", "100001", "Красный Яр \"Южный\"", "100003", 1, "Tab	Sep", "имени В. И. Чапаева", "725109", "100008", "100009", "2023-04-11", "2023-02-11", "2022-03-23", 0, 1),
	("100031", "100032", "пос. Зелёный, д.7", "100034", 1, "Красный Яр \"Южный\"", 1, "499124", "100039", "100040", "2023-10-29", "2024-05-19", "2023-02-28", 0, 1),
	("100062", "100063", "Plain", "100065", "пос. Зелёный, д.7", "Красный Яр \"Южный\"", 0, "388022", NULL, "100071", "2024-06-07", "2024-04-21", "2024-12-24", 1, 1),
	("100093", "100094", "пос. Зелёный, д.7", "100096", "имени В. И. Чапаева", "имени В. И. Чапаева", 0, "511349", "100101", "100102", "2024-01-04", "2021-04-10", "2022-10-20", 0, 0),
	("100124", "100125", "с.Ильинка", "100127", 0, "Plain", "Николаевка", "891059", "100132", "100133", "2022-01-19", "2021-07-06", "2024-04-05", 1, 1),
	("100155", "100156", "с.Ильинка", "100158", "О'Хара", "Красный Яр \"Южный\"", "пос. Зелёный, д.7", "771629", NULL, "100164", "2024-05-29", "2024-12-09", "2022-02-01", 1, 0);
/*!40000 ALTER TABLE `ADDR_OBJ` ENABLE KEYS */;

-- Region: `77`, Table: `CHANGE_HISTORY`

/*!40000 ALTER TABLE `CHANGE_HISTORY` DISABLE KEYS */;
/*!40000 ALTER TABLE `CHANGE_HISTORY` ENABLE KEYS */;

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
