-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.511024                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `NORMATIVE_DOCS`;
CREATE TABLE `NORMATIVE_DOCS` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор документа',
  `NAME` VARCHAR(128) NOT NULL COMMENT 'Наименование документа',
  `DATE` DATE NOT NULL COMMENT 'Дата документа',
  `NUMBER` VARCHAR(150) NOT NULL COMMENT 'Номер документа',
  `TYPE` INT(10) NOT NULL COMMENT 'Тип документа',
  `KIND` INT(10) NOT NULL COMMENT 'Вид документа',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата обновления',
  `ORGNAME` VARCHAR(255) NULL DEFAULT NULL COMMENT 'Наименование органа создавшего нормативный документ',
  `REGNUM` VARCHAR(100) NULL DEFAULT NULL COMMENT 'Номер государственной регистрации',
  `REGDATE` DATE NULL DEFAULT NULL COMMENT 'Дата государственной регистрации',
  `ACCDATE` DATE NULL DEFAULT NULL COMMENT 'Дата вступления в силу нормативного документа',
  `COMMENT` VARCHAR(128) NULL DEFAULT NULL COMMENT 'Комментарий',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for NORMATIVE_DOCS'; 

