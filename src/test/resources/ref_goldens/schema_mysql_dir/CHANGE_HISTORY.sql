-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510845                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `CHANGE_HISTORY`;
CREATE TABLE `CHANGE_HISTORY` (
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции. Ключевое поле',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Уникальный ID объекта',
  `ADROBJECTID` VARCHAR(36) NOT NULL COMMENT 'Уникальный ID изменившей транзакции (GUID)',
  `OPERTYPEID` INT(10) NOT NULL COMMENT 'Тип операции',
  `NDOCID` INT(19) NULL DEFAULT NULL COMMENT 'ID документа',
  `CHANGEDATE` DATE NOT NULL COMMENT 'Дата изменения',
  PRIMARY KEY (`CHANGEID`)
) ENGINE = MyISAM COMMENT='Fixture set for CHANGE_HISTORY'; 

