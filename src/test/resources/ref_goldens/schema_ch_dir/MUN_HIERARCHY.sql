-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.076247                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `MUN_HIERARCHY`;
CREATE TABLE `MUN_HIERARCHY` (
  `ID` Int64 NOT NULL COMMENT 'Уникальный идентификатор записи',
  `OBJECTID` Int64 NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `PARENTOBJID` Int64 NULL DEFAULT NULL COMMENT 'Идентификатор родительского объекта',
  `CHANGEID` Int64 NOT NULL COMMENT 'ID изменившей транзакции',
  `OKTMO` String NULL DEFAULT NULL COMMENT 'Код ОКТМО',
  `PREVID` Int64 NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` Int64 NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` Date NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` Date NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` Bool NOT NULL COMMENT 'Признак действующего адресного объекта',
  `PATH` String NOT NULL COMMENT 'Материализованный путь к объекту (полная иерархия)',
  PRIMARY KEY (`ID`)
) ENGINE = MergeTree COMMENT 'Fixture set for MUN_HIERARCHY'; 

