-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.076291                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `NORMATIVE_DOCS`;
CREATE TABLE `NORMATIVE_DOCS` (
  `ID` Int64 NOT NULL COMMENT 'Уникальный идентификатор документа',
  `NAME` String NOT NULL COMMENT 'Наименование документа',
  `DATE` Date NOT NULL COMMENT 'Дата документа',
  `NUMBER` String NOT NULL COMMENT 'Номер документа',
  `TYPE` Int32 NOT NULL COMMENT 'Тип документа',
  `KIND` Int32 NOT NULL COMMENT 'Вид документа',
  `UPDATEDATE` Date NOT NULL COMMENT 'Дата обновления',
  `ORGNAME` String NULL DEFAULT NULL COMMENT 'Наименование органа создавшего нормативный документ',
  `REGNUM` String NULL DEFAULT NULL COMMENT 'Номер государственной регистрации',
  `REGDATE` Date NULL DEFAULT NULL COMMENT 'Дата государственной регистрации',
  `ACCDATE` Date NULL DEFAULT NULL COMMENT 'Дата вступления в силу нормативного документа',
  `COMMENT` String NULL DEFAULT NULL COMMENT 'Комментарий',
  PRIMARY KEY (`ID`)
) ENGINE = MergeTree COMMENT 'Fixture set for NORMATIVE_DOCS'; 

