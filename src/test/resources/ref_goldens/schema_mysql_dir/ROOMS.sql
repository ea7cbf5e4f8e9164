-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.511122                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `ROOMS`;
CREATE TABLE `ROOMS` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор комнаты',
  `OBJECTGUID` VARCHAR(36) NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `NUMBER` VARCHAR(50) NOT NULL COMMENT 'Номер комнаты или офиса',
  `ROOMTYPE` INT(10) NOT NULL COMMENT 'Тип комнаты или офиса',
  `OPERTYPEID` INT(10) NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` INT(1) NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ROOMS'; 

