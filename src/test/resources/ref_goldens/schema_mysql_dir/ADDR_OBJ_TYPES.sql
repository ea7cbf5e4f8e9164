-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510022                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `ADDR_OBJ_TYPES`;
CREATE TABLE `ADDR_OBJ_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор записи',
  `LEVEL` INT(5) NOT NULL COMMENT 'Уровень адресного объекта',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ADDR_OBJ_TYPES'; 

