-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510520                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `ADDR_OBJ_DIVISION`;
CREATE TABLE `ADDR_OBJ_DIVISION` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи',
  `PARENTID` INT(19) NOT NULL COMMENT 'Родительский ID',
  `CHILDID` INT(19) NOT NULL COMMENT 'Дочерний ID',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ADDR_OBJ_DIVISION'; 

