-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.337126                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS `ADDHOUSE_TYPES`;
CREATE TABLE `ADDHOUSE_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for HOUSE_TYPES'; 

DROP TABLE IF EXISTS `ADDR_OBJ_TYPES`;
CREATE TABLE `ADDR_OBJ_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор записи',
  `LEVEL` INT(5) NOT NULL COMMENT 'Уровень адресного объекта',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ADDR_OBJ_TYPES'; 

DROP TABLE IF EXISTS `APARTMENT_TYPES`;
CREATE TABLE `APARTMENT_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор типа помещения',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for APARTMENT_TYPES'; 

DROP TABLE IF EXISTS `HOUSE_TYPES`;
CREATE TABLE `HOUSE_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for HOUSE_TYPES'; 

DROP TABLE IF EXISTS `NORMATIVE_DOCS_KINDS`;
CREATE TABLE `NORMATIVE_DOCS_KINDS` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор записи',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for NORMATIVE_DOCS_KINDS'; 

DROP TABLE IF EXISTS `NORMATIVE_DOCS_TYPES`;
CREATE TABLE `NORMATIVE_DOCS_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор записи',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for NORMATIVE_DOCS_TYPES'; 

DROP TABLE IF EXISTS `OBJECT_LEVELS`;
CREATE TABLE `OBJECT_LEVELS` (
  `LEVEL` INT(5) NOT NULL COMMENT 'Уникальный идентификатор уровня. Ключевое поле',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего уровня',
  PRIMARY KEY (`LEVEL`)
) ENGINE = MyISAM COMMENT='Fixture set for OBJECT_LEVELS'; 

DROP TABLE IF EXISTS `OPERATION_TYPES`;
CREATE TABLE `OPERATION_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор статуса (ключ)',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for OPERATION_TYPES'; 

DROP TABLE IF EXISTS `PARAM_TYPES`;
CREATE TABLE `PARAM_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор типа параметра (ключ)',
  `NAME` VARCHAR(50) NOT NULL COMMENT 'Наименование',
  `CODE` VARCHAR(50) NOT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(120) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM_TYPES'; 

DROP TABLE IF EXISTS `ROOM_TYPES`;
CREATE TABLE `ROOM_TYPES` (
  `ID` INT(10) NOT NULL COMMENT 'Идентификатор типа (ключ)',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `SHORTNAME` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Краткое наименование',
  `DESC` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Описание',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Статус активности',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ROOM_TYPES'; 

DROP TABLE IF EXISTS `ADDR_OBJ`;
CREATE TABLE `ADDR_OBJ` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `OBJECTGUID` VARCHAR(36) NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `NAME` VARCHAR(250) NOT NULL COMMENT 'Наименование',
  `TYPENAME` VARCHAR(50) NOT NULL COMMENT 'Краткое наименование типа объекта',
  `LEVEL` VARCHAR(10) NOT NULL COMMENT 'Уровень адресного объекта',
  `OPERTYPEID` INT(10) NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` INT(1) NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ADDR_OBJ'; 

DROP TABLE IF EXISTS `ADDR_OBJ_DIVISION`;
CREATE TABLE `ADDR_OBJ_DIVISION` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи',
  `PARENTID` INT(19) NOT NULL COMMENT 'Родительский ID',
  `CHILDID` INT(19) NOT NULL COMMENT 'Дочерний ID',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ADDR_OBJ_DIVISION'; 

DROP TABLE IF EXISTS `ADDR_OBJ_PARAMS`;
CREATE TABLE `ADDR_OBJ_PARAMS` (
  `ID` INT(19) NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` INT(19) NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` INT(19) NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` INT(10) NOT NULL COMMENT 'Тип параметра',
  `VALUE` VARCHAR(128) NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM'; 

DROP TABLE IF EXISTS `ADM_HIERARCHY`;
CREATE TABLE `ADM_HIERARCHY` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор объекта',
  `PARENTOBJID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор родительского объекта',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `REGIONCODE` VARCHAR(4) NULL DEFAULT NULL COMMENT 'Код региона',
  `AREACODE` VARCHAR(4) NULL DEFAULT NULL COMMENT 'Код района',
  `CITYCODE` VARCHAR(4) NULL DEFAULT NULL COMMENT 'Код города',
  `PLACECODE` VARCHAR(4) NULL DEFAULT NULL COMMENT 'Код населенного пункта',
  `PLANCODE` VARCHAR(4) NULL DEFAULT NULL COMMENT 'Код ЭПС',
  `STREETCODE` VARCHAR(4) NULL DEFAULT NULL COMMENT 'Код улицы',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  `PATH` VARCHAR(128) NOT NULL COMMENT 'Материализованный путь к объекту (полная иерархия)',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for ADM_HIERARCHY'; 

DROP TABLE IF EXISTS `APARTMENTS`;
CREATE TABLE `APARTMENTS` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор помещения',
  `OBJECTGUID` VARCHAR(36) NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `NUMBER` VARCHAR(50) NOT NULL COMMENT 'Номер помещения',
  `APARTTYPE` INT(10) NOT NULL COMMENT 'Тип помещения',
  `OPERTYPEID` INT(10) NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` INT(1) NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for APARTMENTS'; 

DROP TABLE IF EXISTS `APARTMENTS_PARAMS`;
CREATE TABLE `APARTMENTS_PARAMS` (
  `ID` INT(19) NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` INT(19) NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` INT(19) NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` INT(10) NOT NULL COMMENT 'Тип параметра',
  `VALUE` VARCHAR(128) NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM'; 

DROP TABLE IF EXISTS `CARPLACES`;
CREATE TABLE `CARPLACES` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор машино-места',
  `OBJECTGUID` VARCHAR(36) NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `NUMBER` VARCHAR(50) NOT NULL COMMENT 'Номер машиноместа',
  `OPERTYPEID` INT(10) NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` INT(1) NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for CARPLACES'; 

DROP TABLE IF EXISTS `CARPLACES_PARAMS`;
CREATE TABLE `CARPLACES_PARAMS` (
  `ID` INT(19) NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` INT(19) NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` INT(19) NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` INT(10) NOT NULL COMMENT 'Тип параметра',
  `VALUE` VARCHAR(128) NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM'; 

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

DROP TABLE IF EXISTS `HOUSES`;
CREATE TABLE `HOUSES` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор дома',
  `OBJECTGUID` VARCHAR(36) NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `HOUSENUM` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Основной номер дома',
  `ADDNUM1` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Дополнительный номер дома 1',
  `ADDNUM2` VARCHAR(50) NULL DEFAULT NULL COMMENT 'Дополнительный номер дома 2',
  `HOUSETYPE` INT(10) NULL DEFAULT NULL COMMENT 'Основной тип дома',
  `ADDTYPE1` INT(10) NULL DEFAULT NULL COMMENT 'Дополнительный тип дома 1',
  `ADDTYPE2` INT(10) NULL DEFAULT NULL COMMENT 'Дополнительный тип дома 2',
  `OPERTYPEID` INT(10) NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` INT(1) NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for HOUSES'; 

DROP TABLE IF EXISTS `HOUSES_PARAMS`;
CREATE TABLE `HOUSES_PARAMS` (
  `ID` INT(19) NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` INT(19) NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` INT(19) NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` INT(10) NOT NULL COMMENT 'Тип параметра',
  `VALUE` VARCHAR(128) NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM'; 

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

DROP TABLE IF EXISTS `ROOMS_PARAMS`;
CREATE TABLE `ROOMS_PARAMS` (
  `ID` INT(19) NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` INT(19) NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` INT(19) NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` INT(10) NOT NULL COMMENT 'Тип параметра',
  `VALUE` VARCHAR(128) NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM'; 

DROP TABLE IF EXISTS `STEADS`;
CREATE TABLE `STEADS` (
  `ID` INT(19) NOT NULL COMMENT 'Уникальный идентификатор записи. Ключевое поле',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор земельного участка',
  `OBJECTGUID` VARCHAR(36) NOT NULL COMMENT 'Глобальный уникальный идентификатор (GUID)',
  `CHANGEID` INT(19) NOT NULL COMMENT 'ID изменившей транзакции',
  `NUMBER` VARCHAR(250) NULL DEFAULT NULL COMMENT 'Номер земельного участка',
  `OPERTYPEID` INT(10) NOT NULL COMMENT 'Статус действия над записью',
  `PREVID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с предыдущей исторической записью',
  `NEXTID` INT(19) NULL DEFAULT NULL COMMENT 'Идентификатор записи связывания с последующей исторической записью',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Начало действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Окончание действия записи',
  `ISACTUAL` INT(1) NOT NULL COMMENT 'Статус актуальности адресного объекта ФИАС',
  `ISACTIVE` INT(1) NOT NULL COMMENT 'Признак действующего адресного объекта',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for STEADS'; 

DROP TABLE IF EXISTS `STEADS_PARAMS`;
CREATE TABLE `STEADS_PARAMS` (
  `ID` INT(19) NOT NULL COMMENT 'Идентификатор записи',
  `OBJECTID` INT(19) NOT NULL COMMENT 'Глобальный уникальный идентификатор адресного объекта',
  `CHANGEID` INT(19) NULL DEFAULT NULL COMMENT 'ID изменившей транзакции',
  `CHANGEIDEND` INT(19) NOT NULL COMMENT 'ID завершившей транзакции',
  `TYPEID` INT(10) NOT NULL COMMENT 'Тип параметра',
  `VALUE` VARCHAR(128) NOT NULL COMMENT 'Значение параметра',
  `UPDATEDATE` DATE NOT NULL COMMENT 'Дата внесения (обновления) записи',
  `STARTDATE` DATE NOT NULL COMMENT 'Дата начала действия записи',
  `ENDDATE` DATE NOT NULL COMMENT 'Дата окончания действия записи',
  PRIMARY KEY (`ID`)
) ENGINE = MyISAM COMMENT='Fixture set for PARAM'; 

