-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.075306                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `NORMATIVE_DOCS_KINDS`;
CREATE TABLE `NORMATIVE_DOCS_KINDS` (
  `ID` Int32 NOT NULL COMMENT 'Идентификатор записи',
  `NAME` String NOT NULL COMMENT 'Наименование',
  PRIMARY KEY (`ID`)
) ENGINE = MergeTree COMMENT 'Fixture set for NORMATIVE_DOCS_KINDS'; 

