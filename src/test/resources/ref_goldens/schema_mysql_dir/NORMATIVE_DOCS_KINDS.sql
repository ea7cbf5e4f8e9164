-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510149                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `NORMATIVE_DOCS_KINDS`;
CREATE TABLE `NORMATIVE_DOCS_KINDS` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор записи',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for NORMATIVE_DOCS_KINDS'; 

