-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.075236                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `HOUSE_TYPES`;
CREATE TABLE `HOUSE_TYPES` (
  `ID` Int32 NOT NULL COMMENT 'Идентификатор',
  `NAME` String NOT NULL COMMENT 'Наименование',
  `SHORTNAME` String NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` String NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` Date NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` Date NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` Bool NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MergeTree COMMENT 'Fixture set for HOUSE_TYPES'; 

