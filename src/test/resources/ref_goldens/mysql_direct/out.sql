-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:07.014568                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

-- Table: `ADDHOUSE_TYPES`

/*!40000 ALTER TABLE `ADDHOUSE_TYPES` DISABLE KEYS */;
INSERT INTO `ADDHOUSE_TYPES` (`ID`, `NAME`, `SHORTNAME`, `DESC`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTIVE`) VALUES 
	("354363", "имени В. И. Чапаева", "Back\\slash", "Красный Яр \"Южный\"", "2022-09-23", "2024-07-27", "2023-02-12", 0),
	("588207", "пос. Зелёный, д.7", "ул. Мира", "пос. Зелёный, д.7", "2022-11-17", "2021-10-10", "2022-11-02", 1);
/*!40000 ALTER TABLE `ADDHOUSE_TYPES` ENABLE KEYS */;

-- Table: `HOUSE_TYPES`

/*!40000 ALTER TABLE `HOUSE_TYPES` DISABLE KEYS */;
INSERT INTO `HOUSE_TYPES` (`ID`, `NAME`, `SHORTNAME`, `DESC`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTIVE`) VALUES 
	("205693", "Николаевка", "Николаевка", 1, "2022-08-09", "2022-04-18", "2024-07-12", 1),
	("44167", "с.Ильинка", "О'Хара", NULL, "2023-01-02", "2023-01-11", "2021-07-22", 1),
	("938558", "Красный Яр \"Южный\"", "Николаевка", "Tab	Sep", "2025-01-24", "2021-09-15", "2021-02-11", 0);
/*!40000 ALTER TABLE `HOUSE_TYPES` ENABLE KEYS */;

-- Table: `OBJECT_LEVELS`

/*!40000 ALTER TABLE `OBJECT_LEVELS` DISABLE KEYS */;
INSERT INTO `OBJECT_LEVELS` (`LEVEL`, `NAME`, `SHORTNAME`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTIVE`) VALUES 
	("25", 1, "с.Ильинка", "2023-10-20", "2022-12-12", "2024-07-26", 1),
	("90", "Plain", "Tab	Sep", "2024-11-09", "2024-07-23", "2023-04-04", 0),
	("73", "ул. Мира", "Красный Яр \"Южный\"", "2022-05-17", "2022-09-25", "2023-04-01", 0);
/*!40000 ALTER TABLE `OBJECT_LEVELS` ENABLE KEYS */;

-- Table: `PARAM_TYPES`

/*!40000 ALTER TABLE `PARAM_TYPES` DISABLE KEYS */;
INSERT INTO `PARAM_TYPES` (`ID`, `NAME`, `CODE`, `DESC`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTIVE`) VALUES 
	("185623", "Back\\slash", "Красный Яр \"Южный\"", "пос. Зелёный, д.7", "2021-01-24", "2023-04-24", "2022-04-28", 1),
	("423748", "с.Ильинка", "Back\\slash", "О'Хара", "2024-11-21", "2024-09-09", "2022-09-09", 0),
	("656097", "ул. Мира", "пос. Зелёный, д.7", "О'Хара", "2021-07-02", "2021-12-11", "2022-06-29", 1);
/*!40000 ALTER TABLE `PARAM_TYPES` ENABLE KEYS */;

-- Region: `01`, Table: `ADDR_OBJ`

/*!40000 ALTER TABLE `ADDR_OBJ` DISABLE KEYS */;
INSERT INTO `ADDR_OBJ` (`ID`, `OBJECTID`, `OBJECTGUID`, `CHANGEID`, `NAME`, `TYPENAME`, `LEVEL`, `OPERTYPEID`, `PREVID`, `NEXTID`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTUAL`, `ISACTIVE`) VALUES 
	("100000", "100001", "Tab	Sep", "100003", "Tab	Sep", 0, "Plain", "21259", "100008", "100009", "2021-11-02", "2021-10-26", "2021-03-14", 0, 1),
	("100031", "100032", 1, "100034", "пос. Зелёный, д.7", "Николаевка", "Plain", "57231", "100039", "100040", "2023-09-04", "2022-06-28", "2023-01-27", 0, 1),
	("100062", "100063", "Back\\slash", "100065", "Красный Яр \"Южный\"", "Николаевка", "ул. Мира", "317196", "100070", "100071", "2022-12-02", "2021-09-04", "2021-11-12", 0, 0),
	("100093", "100094", "Tab	Sep", "100096", "О'Хара", "Красный Яр \"Южный\"", "Красный Яр \"Южный\"", "410101", "100101", "100102", "2024-02-15", "2023-01-14", "2022-11-14", 0, 0),
	("100124", "100125", "пос. Зелёный, д.7", "100127", "пос. Зелёный, д.7", "Back\\slash", "с.Ильинка", "275613", "100132", "100133", "2025-01-28", "2023-05-15", "2024-09-25", 0, 1);
/*!40000 ALTER TABLE `ADDR_OBJ` ENABLE KEYS */;

-- Region: `01`, Table: `CHANGE_HISTORY`

/*!40000 ALTER TABLE `CHANGE_HISTORY` DISABLE KEYS */;
INSERT INTO `CHANGE_HISTORY` (`CHANGEID`, `OBJECTID`, `ADROBJECTID`, `OPERTYPEID`, `NDOCID`, `CHANGEDATE`) VALUES 
	("100000", "100001", "с.Ильинка", "570025", "100004", "2021-10-08"),
	("100031", "100032", "О'Хара", "696631", "100035", "2025-01-31"),
	("100062", "100063", 1, "242636", "100066", "2024-03-15");
/*!40000 ALTER TABLE `CHANGE_HISTORY` ENABLE KEYS */;

-- Region: `01`, Table: `HOUSES_PARAMS`

/*!40000 ALTER TABLE `HOUSES_PARAMS` DISABLE KEYS */;
INSERT INTO `HOUSES_PARAMS` (`ID`, `OBJECTID`, `CHANGEID`, `CHANGEIDEND`, `TYPEID`, `VALUE`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`) VALUES 
	("100000", "100001", NULL, "100003", "170942", 1, "2023-05-10", "2021-03-13", "2021-05-26"),
	("100031", "100032", "100033", "100034", "110478", "пос. Зелёный, д.7", "2021-06-05", "2021-02-18", "2024-02-23"),
	("100062", "100063", "100064", "100065", "864827", "Back\\slash", "2024-12-07", "2021-11-01", "2023-07-28"),
	("100093", "100094", "100095", "100096", "174851", "ул. Мира", "2024-10-02", "2022-08-01", "2021-04-27");
/*!40000 ALTER TABLE `HOUSES_PARAMS` ENABLE KEYS */;

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
