-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.511079                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `REESTR_OBJECTS`;
CREATE TABLE `REESTR_OBJECTS` (
  `OBJECTID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор объекта. Ключевое поле',
  `CREATEDATE` DATE NOT NULL COMMENT 'Дата создания',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `LEVELID` INT(10) NOT NULL COMMENT 'Уровень объекта',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата обновления',
  `OBJECTGUID` VARCHAR(36) NOT NULL COMMENT 'GUID объекта',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего объекта',
  PRIMARY KEY (`OBJECTID`)
) ENGINE = MyISAM COMMENT='Fixture set for REESTR_OBJECTS'; 

