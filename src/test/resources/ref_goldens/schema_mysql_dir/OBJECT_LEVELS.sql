-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510267                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `OBJECT_LEVELS`;
CREATE TABLE `OBJECT_LEVELS` (
  `LEVEL` INT(5) NOT NULL COMMENT 'Уникальный идентификатор уровня. Ключевое поле',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего уровня',
  PRIMARY KEY (`LEVEL`)
) ENGINE = MyISAM COMMENT='Fixture set for OBJECT_LEVELS'; 

