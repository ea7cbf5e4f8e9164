-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510384                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `PARAM_TYPES`;
CREATE TABLE `PARAM_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор типа параметра (ключ)',
  `NAME` VARCHAR(50) NOT NULL COMMENT 'Наименование',
  `CODE` VARCHAR(50) NOT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(120) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM_TYPES'; 

