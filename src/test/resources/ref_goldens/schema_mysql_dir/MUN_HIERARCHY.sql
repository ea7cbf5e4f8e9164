-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.510979                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `MUN_HIERARCHY`;
CREATE TABLE `MUN_HIERARCHY` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `PARENTOBJID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор родительского объекта',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `OKTMO` VARCHAR(11) NULL DEFAULT NULL COMMENT 'Код ОКТМО',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  `PATH` VARCHAR(128) NOT NULL COMMENT 'Материализованный путь к объекту (полная иерархия)',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for MUN_HIERARCHY'; 

