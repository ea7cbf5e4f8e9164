-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.076194                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `HOUSES_PARAMS`;
CREATE TABLE `HOUSES_PARAMS` (
  `ID` Int64 NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` Int64 NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` Int64 NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` Int64 NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` Int32 NOT NULL COMMENT 'Тип параметра',
  `VALUE` String NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` Date NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` Date NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MergeTree COMMENT 'Fixture set for PARAM'; 

