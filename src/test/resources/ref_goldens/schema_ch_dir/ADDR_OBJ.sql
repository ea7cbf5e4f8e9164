-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.075686                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `ADDR_OBJ`;
CREATE TABLE `ADDR_OBJ` (
  `ID` Int64 NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` Int64 NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `OBJECTGUID` String NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` Int64 NOT NULL COMMENT 'ID изменившей транзакции',
  `NAME` String NOT NULL COMMENT 'Наименование',
  `TYPENAME` String NOT NULL COMMENT 'Краткое наименование типа объекта',
  `LEVEL` String NOT NULL COMMENT 'Уровень адресного объекта',
  `OPERTYPEID` Int32 NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` Int64 NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` Int64 NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` Date NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` Date NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` Bool NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` Bool NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MergeTree COMMENT 'Fixture set for ADDR_OBJ'; 

