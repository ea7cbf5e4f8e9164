-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510207                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `NORMATIVE_DOCS_TYPES`;
CREATE TABLE `NORMATIVE_DOCS_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор записи',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for NORMATIVE_DOCS_TYPES'; 

