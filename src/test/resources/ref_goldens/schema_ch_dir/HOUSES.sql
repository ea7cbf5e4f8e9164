-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.076133                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `HOUSES`;
CREATE TABLE `HOUSES` (
  `ID` Int64 NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` Int64 NOT NULL COMMENT 'Глобальный уникальный идентификатор дома',
  `OBJECTGUID` String NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` Int64 NOT NULL COMMENT 'ID изменившей транзакции',
  `HOUSENUM` String NULL DEFAULT NULL COMMENT 'Основной номер дома',
  `ADDNUM1` String NULL DEFAULT NULL COMMENT 'Дополнительный номер дома 1',
  `ADDNUM2` String NULL DEFAULT NULL COMMENT 'Дополнительный номер дома 2',
  `HOUSETYPE` Int32 NULL DEFAULT NULL COMMENT 'Основной тип дома',
  `ADDTYPE1` Int32 NULL DEFAULT NULL COMMENT 'Дополнительный тип дома 1',
  `ADDTYPE2` Int32 NULL DEFAULT NULL COMMENT 'Дополнительный тип дома 2',
  `OPERTYPEID` Int32 NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` Int64 NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` Int64 NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` Date NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` Date NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` Bool NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` Bool NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MergeTree COMMENT 'Fixture set for HOUSES'; 

