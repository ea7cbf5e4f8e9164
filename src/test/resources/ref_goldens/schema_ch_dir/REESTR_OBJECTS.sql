-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.076338                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `REESTR_OBJECTS`;
CREATE TABLE `REESTR_OBJECTS` (
  `OBJECTID` Int64 NOT NULL COMMENT 'Уникальный идентификатор объекта. Ключевое поле',
  `CREATEDATE` Date NOT NULL COMMENT 'Дата создания',
  `CHANGEID` Int64 NOT NULL COMMENT 'ID изменившей транзакции',
  `LEVELID` Int32 NOT NULL COMMENT 'Уровень объекта',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата обновления',
  `OBJECTGUID` String NOT NULL COMMENT 'GUID объекта',
  `ISACTIVE` Bool NOT NULL COMMENT 'Признак действующего объекта',
  PRIMARY KEY (`OBJECTID`)
) ENGINE = MergeTree COMMENT 'Fixture set for REESTR_OBJECTS'; 

