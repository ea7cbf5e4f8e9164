-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.076077                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `CHANGE_HISTORY`;
CREATE TABLE `CHANGE_HISTORY` (
  `CHANGEID` Int64 NOT NULL COMMENT 'ID изменившей транзакции. Ключевое поле',
  `OBJECTID` Int64 NOT NULL COMMENT 'Уникальный ID объекта',
  `ADROBJECTID` String NOT NULL COMMENT 'Уникальный ID изменившей транзакции (GUID)',
  `OPERTYPEID` Int32 NOT NULL COMMENT 'Тип операции',
  `NDOCID` Int64 NULL DEFAULT NULL COMMENT 'ID документа',
  `CHANGEDATE` Date NOT NULL COMMENT 'Дата изменения',
  PRIMARY KEY (`CHANGEID`)
) ENGINE = MergeTree COMMENT 'Fixture set for CHANGE_HISTORY'; 

