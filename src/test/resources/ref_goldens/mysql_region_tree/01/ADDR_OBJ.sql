-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:06.377914                                           --
-- --------------------------------------------------------------------------------- --

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET NAMES utf8mb4 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;

-- Region: `01`, Table: `ADDR_OBJ`

/*!40000 ALTER TABLE `ADDR_OBJ` DISABLE KEYS */;
INSERT INTO `ADDR_OBJ` (`ID`, `OBJECTID`, `OBJECTGUID`, `CHANGEID`, `NAME`, `TYPENAME`, `LEVEL`, `OPERTYPEID`, `PREVID`, `NEXTID`, `UPDATEDATE`, `STARTDATE`, `ENDDATE`, `ISACTUAL`, `ISACTIVE`) VALUES 
	("100000", "100001", "Tab	Sep", "100003", "Tab	Sep", 0, "Plain", "21259", "100008", "100009", "2021-11-02", "2021-10-26", "2021-03-14", 0, 1),
	("100031", "100032", 1, "100034", "пос. Зелёный, д.7", "Николаевка", "Plain", "57231", "100039", "100040", "2023-09-04", "2022-06-28", "2023-01-27", 0, 1),
	("100062", "100063", "Back\\slash", "100065", "Красный Яр \"Южный\"", "Николаевка", "ул. Мира", "317196", "100070", "100071", "2022-12-02", "2021-09-04", "2021-11-12", 0, 0),
	("100093", "100094", "Tab	Sep", "100096", "О'Хара", "Красный Яр \"Южный\"", "Красный Яр \"Южный\"", "410101", "100101", "100102", "2024-02-15", "2023-01-14", "2022-11-14", 0, 0),
	("100124", "100125", "пос. Зелёный, д.7", "100127", "пос. Зелёный, д.7", "Back\\slash", "с.Ильинка", "275613", "100132", "100133", "2025-01-28", "2023-05-15", "2024-09-25", 0, 1);
/*!40000 ALTER TABLE `ADDR_OBJ` ENABLE KEYS */;

/*!40101 SET SQL_MODE=IFNULL(@OLD_SQL_MODE, '') */;
/*!40014 SET FOREIGN_KEY_CHECKS=IF(@OLD_FOREIGN_KEY_CHECKS IS NULL, 1, @OLD_FOREIGN_KEY_CHECKS) */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
