-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.075422                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `OBJECT_LEVELS`;
CREATE TABLE `OBJECT_LEVELS` (
  `LEVEL` Int16 NOT NULL COMMENT 'Уникальный идентификатор уровня. Ключевое поле',
  `NAME` String NOT NULL COMMENT 'Наименование',
  `SHORTNAME` String NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` Date NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` Date NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` Bool NOT NULL COMMENT 'Признак действующего уровня',
  PRIMARY KEY (`LEVEL`)
) ENGINE = MergeTree COMMENT 'Fixture set for OBJECT_LEVELS'; 

