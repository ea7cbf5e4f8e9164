-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.511172                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `ROOMS_PARAMS`;
CREATE TABLE `ROOMS_PARAMS` (
  `ID` INT(19) NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` INT(19) NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` INT(19) NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` INT(10) NOT NULL COMMENT 'Тип параметра',
  `VALUE` VARCHAR(128) NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM'; 

