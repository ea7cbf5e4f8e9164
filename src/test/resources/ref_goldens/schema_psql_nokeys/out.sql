-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:05.895238                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "ADDHOUSE_TYPES";
CREATE TABLE "ADDHOUSE_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "DESC" varchar(250) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "ADDHOUSE_TYPES" IS 'Fixture set for HOUSE_TYPES';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."ID" IS 'Идентификатор';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ADDHOUSE_TYPES"."ISACTIVE" IS 'Статус активности';

DROP TABLE IF EXISTS "ADDR_OBJ_TYPES";
CREATE TABLE "ADDR_OBJ_TYPES" (
  "ID" integer NOT NULL,
  "LEVEL" smallint NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "DESC" varchar(250) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "ADDR_OBJ_TYPES" IS 'Fixture set for ADDR_OBJ_TYPES';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."LEVEL" IS 'Уровень адресного объекта';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ADDR_OBJ_TYPES"."ISACTIVE" IS 'Статус активности';

DROP TABLE IF EXISTS "APARTMENT_TYPES";
CREATE TABLE "APARTMENT_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "DESC" varchar(250) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "APARTMENT_TYPES" IS 'Fixture set for APARTMENT_TYPES';
COMMENT ON COLUMN "APARTMENT_TYPES"."ID" IS 'Идентификатор типа помещения';
COMMENT ON COLUMN "APARTMENT_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "APARTMENT_TYPES"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "APARTMENT_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "APARTMENT_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "APARTMENT_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "APARTMENT_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "APARTMENT_TYPES"."ISACTIVE" IS 'Статус активности';

DROP TABLE IF EXISTS "HOUSE_TYPES";
CREATE TABLE "HOUSE_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "DESC" varchar(250) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "HOUSE_TYPES" IS 'Fixture set for HOUSE_TYPES';
COMMENT ON COLUMN "HOUSE_TYPES"."ID" IS 'Идентификатор';
COMMENT ON COLUMN "HOUSE_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "HOUSE_TYPES"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "HOUSE_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "HOUSE_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "HOUSE_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "HOUSE_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "HOUSE_TYPES"."ISACTIVE" IS 'Статус активности';

DROP TABLE IF EXISTS "NORMATIVE_DOCS_KINDS";
CREATE TABLE "NORMATIVE_DOCS_KINDS" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL
);

COMMENT ON TABLE "NORMATIVE_DOCS_KINDS" IS 'Fixture set for NORMATIVE_DOCS_KINDS';
COMMENT ON COLUMN "NORMATIVE_DOCS_KINDS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "NORMATIVE_DOCS_KINDS"."NAME" IS 'Наименование';

DROP TABLE IF EXISTS "NORMATIVE_DOCS_TYPES";
CREATE TABLE "NORMATIVE_DOCS_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL
);

COMMENT ON TABLE "NORMATIVE_DOCS_TYPES" IS 'Fixture set for NORMATIVE_DOCS_TYPES';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."ENDDATE" IS 'Дата окончания действия записи';

DROP TABLE IF EXISTS "OBJECT_LEVELS";
CREATE TABLE "OBJECT_LEVELS" (
  "LEVEL" smallint NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "OBJECT_LEVELS" IS 'Fixture set for OBJECT_LEVELS';
COMMENT ON COLUMN "OBJECT_LEVELS"."LEVEL" IS 'Уникальный идентификатор уровня. Ключевое поле';
COMMENT ON COLUMN "OBJECT_LEVELS"."NAME" IS 'Наименование';
COMMENT ON COLUMN "OBJECT_LEVELS"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "OBJECT_LEVELS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "OBJECT_LEVELS"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "OBJECT_LEVELS"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "OBJECT_LEVELS"."ISACTIVE" IS 'Признак действующего уровня';

DROP TABLE IF EXISTS "OPERATION_TYPES";
CREATE TABLE "OPERATION_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "DESC" varchar(250) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "OPERATION_TYPES" IS 'Fixture set for OPERATION_TYPES';
COMMENT ON COLUMN "OPERATION_TYPES"."ID" IS 'Идентификатор статуса (ключ)';
COMMENT ON COLUMN "OPERATION_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "OPERATION_TYPES"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "OPERATION_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "OPERATION_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "OPERATION_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "OPERATION_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "OPERATION_TYPES"."ISACTIVE" IS 'Статус активности';

DROP TABLE IF EXISTS "PARAM_TYPES";
CREATE TABLE "PARAM_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(50) NOT NULL,
  "CODE" varchar(50) NOT NULL,
  "DESC" varchar(120) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "PARAM_TYPES" IS 'Fixture set for PARAM_TYPES';
COMMENT ON COLUMN "PARAM_TYPES"."ID" IS 'Идентификатор типа параметра (ключ)';
COMMENT ON COLUMN "PARAM_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "PARAM_TYPES"."CODE" IS 'Краткое наименование';
COMMENT ON COLUMN "PARAM_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "PARAM_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "PARAM_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "PARAM_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "PARAM_TYPES"."ISACTIVE" IS 'Статус активности';

DROP TABLE IF EXISTS "ROOM_TYPES";
CREATE TABLE "ROOM_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "DESC" varchar(250) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "ROOM_TYPES" IS 'Fixture set for ROOM_TYPES';
COMMENT ON COLUMN "ROOM_TYPES"."ID" IS 'Идентификатор типа (ключ)';
COMMENT ON COLUMN "ROOM_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "ROOM_TYPES"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "ROOM_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "ROOM_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ROOM_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ROOM_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ROOM_TYPES"."ISACTIVE" IS 'Статус активности';

DROP TABLE IF EXISTS "ADDR_OBJ";
CREATE TABLE "ADDR_OBJ" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "TYPENAME" varchar(50) NOT NULL,
  "LEVEL" varchar(10) NOT NULL,
  "OPERTYPEID" integer NOT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTUAL" boolean NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "ADDR_OBJ" IS 'Fixture set for ADDR_OBJ';
COMMENT ON COLUMN "ADDR_OBJ"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "ADDR_OBJ"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "ADDR_OBJ"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "ADDR_OBJ"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "ADDR_OBJ"."NAME" IS 'Наименование';
COMMENT ON COLUMN "ADDR_OBJ"."TYPENAME" IS 'Краткое наименование типа объекта';
COMMENT ON COLUMN "ADDR_OBJ"."LEVEL" IS 'Уровень адресного объекта';
COMMENT ON COLUMN "ADDR_OBJ"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "ADDR_OBJ"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "ADDR_OBJ"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "ADDR_OBJ"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ADDR_OBJ"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ADDR_OBJ"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ADDR_OBJ"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "ADDR_OBJ"."ISACTIVE" IS 'Признак действующего адресного объекта';

DROP TABLE IF EXISTS "ADDR_OBJ_DIVISION";
CREATE TABLE "ADDR_OBJ_DIVISION" (
  "ID" bigint NOT NULL,
  "PARENTID" bigint NOT NULL,
  "CHILDID" bigint NOT NULL,
  "CHANGEID" bigint NOT NULL
);

COMMENT ON TABLE "ADDR_OBJ_DIVISION" IS 'Fixture set for ADDR_OBJ_DIVISION';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."ID" IS 'Уникальный идентификатор записи';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."PARENTID" IS 'Родительский ID';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."CHILDID" IS 'Дочерний ID';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."CHANGEID" IS 'ID изменившей транзакции';

DROP TABLE IF EXISTS "ADDR_OBJ_PARAMS";
CREATE TABLE "ADDR_OBJ_PARAMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "CHANGEID" bigint NULL DEFAULT NULL,
  "CHANGEIDEND" bigint NOT NULL,
  "TYPEID" integer NOT NULL,
  "VALUE" varchar(128) NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL
);

COMMENT ON TABLE "ADDR_OBJ_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "ADDR_OBJ_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

DROP TABLE IF EXISTS "ADM_HIERARCHY";
CREATE TABLE "ADM_HIERARCHY" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "PARENTOBJID" bigint NULL DEFAULT NULL,
  "CHANGEID" bigint NOT NULL,
  "REGIONCODE" varchar(4) NULL DEFAULT NULL,
  "AREACODE" varchar(4) NULL DEFAULT NULL,
  "CITYCODE" varchar(4) NULL DEFAULT NULL,
  "PLACECODE" varchar(4) NULL DEFAULT NULL,
  "PLANCODE" varchar(4) NULL DEFAULT NULL,
  "STREETCODE" varchar(4) NULL DEFAULT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL,
  "PATH" varchar(128) NOT NULL
);

COMMENT ON TABLE "ADM_HIERARCHY" IS 'Fixture set for ADM_HIERARCHY';
COMMENT ON COLUMN "ADM_HIERARCHY"."ID" IS 'Уникальный идентификатор записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."OBJECTID" IS 'Глобальный уникальный идентификатор объекта';
COMMENT ON COLUMN "ADM_HIERARCHY"."PARENTOBJID" IS 'Идентификатор родительского объекта';
COMMENT ON COLUMN "ADM_HIERARCHY"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "ADM_HIERARCHY"."REGIONCODE" IS 'Код региона';
COMMENT ON COLUMN "ADM_HIERARCHY"."AREACODE" IS 'Код района';
COMMENT ON COLUMN "ADM_HIERARCHY"."CITYCODE" IS 'Код города';
COMMENT ON COLUMN "ADM_HIERARCHY"."PLACECODE" IS 'Код населенного пункта';
COMMENT ON COLUMN "ADM_HIERARCHY"."PLANCODE" IS 'Код ЭПС';
COMMENT ON COLUMN "ADM_HIERARCHY"."STREETCODE" IS 'Код улицы';
COMMENT ON COLUMN "ADM_HIERARCHY"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "ADM_HIERARCHY"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "ADM_HIERARCHY"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."ISACTIVE" IS 'Признак действующего адресного объекта';
COMMENT ON COLUMN "ADM_HIERARCHY"."PATH" IS 'Материализованный путь к объекту (полная иерархия)';

DROP TABLE IF EXISTS "APARTMENTS";
CREATE TABLE "APARTMENTS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "NUMBER" varchar(50) NOT NULL,
  "APARTTYPE" integer NOT NULL,
  "OPERTYPEID" integer NOT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTUAL" boolean NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "APARTMENTS" IS 'Fixture set for APARTMENTS';
COMMENT ON COLUMN "APARTMENTS"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "APARTMENTS"."OBJECTID" IS 'Глобальный уникальный идентификатор помещения';
COMMENT ON COLUMN "APARTMENTS"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "APARTMENTS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "APARTMENTS"."NUMBER" IS 'Номер помещения';
COMMENT ON COLUMN "APARTMENTS"."APARTTYPE" IS 'Тип помещения';
COMMENT ON COLUMN "APARTMENTS"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "APARTMENTS"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "APARTMENTS"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "APARTMENTS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "APARTMENTS"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "APARTMENTS"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "APARTMENTS"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "APARTMENTS"."ISACTIVE" IS 'Признак действующего адресного объекта';

DROP TABLE IF EXISTS "APARTMENTS_PARAMS";
CREATE TABLE "APARTMENTS_PARAMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "CHANGEID" bigint NULL DEFAULT NULL,
  "CHANGEIDEND" bigint NOT NULL,
  "TYPEID" integer NOT NULL,
  "VALUE" varchar(128) NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL
);

COMMENT ON TABLE "APARTMENTS_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "APARTMENTS_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

DROP TABLE IF EXISTS "CARPLACES";
CREATE TABLE "CARPLACES" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "NUMBER" varchar(50) NOT NULL,
  "OPERTYPEID" integer NOT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTUAL" boolean NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "CARPLACES" IS 'Fixture set for CARPLACES';
COMMENT ON COLUMN "CARPLACES"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "CARPLACES"."OBJECTID" IS 'Глобальный уникальный идентификатор машино-места';
COMMENT ON COLUMN "CARPLACES"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "CARPLACES"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "CARPLACES"."NUMBER" IS 'Номер машиноместа';
COMMENT ON COLUMN "CARPLACES"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "CARPLACES"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "CARPLACES"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "CARPLACES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "CARPLACES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "CARPLACES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "CARPLACES"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "CARPLACES"."ISACTIVE" IS 'Признак действующего адресного объекта';

DROP TABLE IF EXISTS "CARPLACES_PARAMS";
CREATE TABLE "CARPLACES_PARAMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "CHANGEID" bigint NULL DEFAULT NULL,
  "CHANGEIDEND" bigint NOT NULL,
  "TYPEID" integer NOT NULL,
  "VALUE" varchar(128) NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL
);

COMMENT ON TABLE "CARPLACES_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "CARPLACES_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "CARPLACES_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "CARPLACES_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "CARPLACES_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "CARPLACES_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "CARPLACES_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "CARPLACES_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "CARPLACES_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "CARPLACES_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

DROP TABLE IF EXISTS "CHANGE_HISTORY";
CREATE TABLE "CHANGE_HISTORY" (
  "CHANGEID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "ADROBJECTID" varchar(36) NOT NULL,
  "OPERTYPEID" integer NOT NULL,
  "NDOCID" bigint NULL DEFAULT NULL,
  "CHANGEDATE" date NOT NULL
);

COMMENT ON TABLE "CHANGE_HISTORY" IS 'Fixture set for CHANGE_HISTORY';
COMMENT ON COLUMN "CHANGE_HISTORY"."CHANGEID" IS 'ID изменившей транзакции. Ключевое поле';
COMMENT ON COLUMN "CHANGE_HISTORY"."OBJECTID" IS 'Уникальный ID объекта';
COMMENT ON COLUMN "CHANGE_HISTORY"."ADROBJECTID" IS 'Уникальный ID изменившей транзакции (GUID)';
COMMENT ON COLUMN "CHANGE_HISTORY"."OPERTYPEID" IS 'Тип операции';
COMMENT ON COLUMN "CHANGE_HISTORY"."NDOCID" IS 'ID документа';
COMMENT ON COLUMN "CHANGE_HISTORY"."CHANGEDATE" IS 'Дата изменения';

DROP TABLE IF EXISTS "HOUSES";
CREATE TABLE "HOUSES" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "HOUSENUM" varchar(50) NULL DEFAULT NULL,
  "ADDNUM1" varchar(50) NULL DEFAULT NULL,
  "ADDNUM2" varchar(50) NULL DEFAULT NULL,
  "HOUSETYPE" integer NULL DEFAULT NULL,
  "ADDTYPE1" integer NULL DEFAULT NULL,
  "ADDTYPE2" integer NULL DEFAULT NULL,
  "OPERTYPEID" integer NOT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTUAL" boolean NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "HOUSES" IS 'Fixture set for HOUSES';
COMMENT ON COLUMN "HOUSES"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "HOUSES"."OBJECTID" IS 'Глобальный уникальный идентификатор дома';
COMMENT ON COLUMN "HOUSES"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "HOUSES"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "HOUSES"."HOUSENUM" IS 'Основной номер дома';
COMMENT ON COLUMN "HOUSES"."ADDNUM1" IS 'Дополнительный номер дома 1';
COMMENT ON COLUMN "HOUSES"."ADDNUM2" IS 'Дополнительный номер дома 2';
COMMENT ON COLUMN "HOUSES"."HOUSETYPE" IS 'Основной тип дома';
COMMENT ON COLUMN "HOUSES"."ADDTYPE1" IS 'Дополнительный тип дома 1';
COMMENT ON COLUMN "HOUSES"."ADDTYPE2" IS 'Дополнительный тип дома 2';
COMMENT ON COLUMN "HOUSES"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "HOUSES"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "HOUSES"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "HOUSES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "HOUSES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "HOUSES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "HOUSES"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "HOUSES"."ISACTIVE" IS 'Признак действующего адресного объекта';

DROP TABLE IF EXISTS "HOUSES_PARAMS";
CREATE TABLE "HOUSES_PARAMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "CHANGEID" bigint NULL DEFAULT NULL,
  "CHANGEIDEND" bigint NOT NULL,
  "TYPEID" integer NOT NULL,
  "VALUE" varchar(128) NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL
);

COMMENT ON TABLE "HOUSES_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "HOUSES_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "HOUSES_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "HOUSES_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "HOUSES_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "HOUSES_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "HOUSES_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "HOUSES_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "HOUSES_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "HOUSES_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

DROP TABLE IF EXISTS "MUN_HIERARCHY";
CREATE TABLE "MUN_HIERARCHY" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "PARENTOBJID" bigint NULL DEFAULT NULL,
  "CHANGEID" bigint NOT NULL,
  "OKTMO" varchar(11) NULL DEFAULT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL,
  "PATH" varchar(128) NOT NULL
);

COMMENT ON TABLE "MUN_HIERARCHY" IS 'Fixture set for MUN_HIERARCHY';
COMMENT ON COLUMN "MUN_HIERARCHY"."ID" IS 'Уникальный идентификатор записи';
COMMENT ON COLUMN "MUN_HIERARCHY"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "MUN_HIERARCHY"."PARENTOBJID" IS 'Идентификатор родительского объекта';
COMMENT ON COLUMN "MUN_HIERARCHY"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "MUN_HIERARCHY"."OKTMO" IS 'Код ОКТМО';
COMMENT ON COLUMN "MUN_HIERARCHY"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "MUN_HIERARCHY"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "MUN_HIERARCHY"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "MUN_HIERARCHY"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "MUN_HIERARCHY"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "MUN_HIERARCHY"."ISACTIVE" IS 'Признак действующего адресного объекта';
COMMENT ON COLUMN "MUN_HIERARCHY"."PATH" IS 'Материализованный путь к объекту (полная иерархия)';

DROP TABLE IF EXISTS "NORMATIVE_DOCS";
CREATE TABLE "NORMATIVE_DOCS" (
  "ID" bigint NOT NULL,
  "NAME" varchar(128) NOT NULL,
  "DATE" date NOT NULL,
  "NUMBER" varchar(150) NOT NULL,
  "TYPE" integer NOT NULL,
  "KIND" integer NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "ORGNAME" varchar(255) NULL DEFAULT NULL,
  "REGNUM" varchar(100) NULL DEFAULT NULL,
  "REGDATE" date NULL DEFAULT NULL,
  "ACCDATE" date NULL DEFAULT NULL,
  "COMMENT" varchar(128) NULL DEFAULT NULL
);

COMMENT ON TABLE "NORMATIVE_DOCS" IS 'Fixture set for NORMATIVE_DOCS';
COMMENT ON COLUMN "NORMATIVE_DOCS"."ID" IS 'Уникальный идентификатор документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."NAME" IS 'Наименование документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."DATE" IS 'Дата документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."NUMBER" IS 'Номер документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."TYPE" IS 'Тип документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."KIND" IS 'Вид документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."UPDATEDATE" IS 'Дата обновления';
COMMENT ON COLUMN "NORMATIVE_DOCS"."ORGNAME" IS 'Наименование органа создавшего нормативный документ';
COMMENT ON COLUMN "NORMATIVE_DOCS"."REGNUM" IS 'Номер государственной регистрации';
COMMENT ON COLUMN "NORMATIVE_DOCS"."REGDATE" IS 'Дата государственной регистрации';
COMMENT ON COLUMN "NORMATIVE_DOCS"."ACCDATE" IS 'Дата вступления в силу нормативного документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."COMMENT" IS 'Комментарий';

DROP TABLE IF EXISTS "REESTR_OBJECTS";
CREATE TABLE "REESTR_OBJECTS" (
  "OBJECTID" bigint NOT NULL,
  "CREATEDATE" date NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "LEVELID" integer NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "REESTR_OBJECTS" IS 'Fixture set for REESTR_OBJECTS';
COMMENT ON COLUMN "REESTR_OBJECTS"."OBJECTID" IS 'Уникальный идентификатор объекта. Ключевое поле';
COMMENT ON COLUMN "REESTR_OBJECTS"."CREATEDATE" IS 'Дата создания';
COMMENT ON COLUMN "REESTR_OBJECTS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "REESTR_OBJECTS"."LEVELID" IS 'Уровень объекта';
COMMENT ON COLUMN "REESTR_OBJECTS"."UPDATEDATE" IS 'Дата обновления';
COMMENT ON COLUMN "REESTR_OBJECTS"."OBJECTGUID" IS 'GUID объекта';
COMMENT ON COLUMN "REESTR_OBJECTS"."ISACTIVE" IS 'Признак действующего объекта';

DROP TABLE IF EXISTS "ROOMS";
CREATE TABLE "ROOMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "NUMBER" varchar(50) NOT NULL,
  "ROOMTYPE" integer NOT NULL,
  "OPERTYPEID" integer NOT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTUAL" boolean NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "ROOMS" IS 'Fixture set for ROOMS';
COMMENT ON COLUMN "ROOMS"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "ROOMS"."OBJECTID" IS 'Глобальный уникальный идентификатор комнаты';
COMMENT ON COLUMN "ROOMS"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "ROOMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "ROOMS"."NUMBER" IS 'Номер комнаты или офиса';
COMMENT ON COLUMN "ROOMS"."ROOMTYPE" IS 'Тип комнаты или офиса';
COMMENT ON COLUMN "ROOMS"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "ROOMS"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "ROOMS"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "ROOMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ROOMS"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ROOMS"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ROOMS"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "ROOMS"."ISACTIVE" IS 'Признак действующего адресного объекта';

DROP TABLE IF EXISTS "ROOMS_PARAMS";
CREATE TABLE "ROOMS_PARAMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "CHANGEID" bigint NULL DEFAULT NULL,
  "CHANGEIDEND" bigint NOT NULL,
  "TYPEID" integer NOT NULL,
  "VALUE" varchar(128) NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL
);

COMMENT ON TABLE "ROOMS_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "ROOMS_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "ROOMS_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "ROOMS_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "ROOMS_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "ROOMS_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "ROOMS_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "ROOMS_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ROOMS_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "ROOMS_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

DROP TABLE IF EXISTS "STEADS";
CREATE TABLE "STEADS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "NUMBER" varchar(250) NULL DEFAULT NULL,
  "OPERTYPEID" integer NOT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTUAL" boolean NOT NULL,
  "ISACTIVE" boolean NOT NULL
);

COMMENT ON TABLE "STEADS" IS 'Fixture set for STEADS';
COMMENT ON COLUMN "STEADS"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "STEADS"."OBJECTID" IS 'Глобальный уникальный идентификатор земельного участка';
COMMENT ON COLUMN "STEADS"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "STEADS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "STEADS"."NUMBER" IS 'Номер земельного участка';
COMMENT ON COLUMN "STEADS"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "STEADS"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "STEADS"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "STEADS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "STEADS"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "STEADS"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "STEADS"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "STEADS"."ISACTIVE" IS 'Признак действующего адресного объекта';

DROP TABLE IF EXISTS "STEADS_PARAMS";
CREATE TABLE "STEADS_PARAMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "CHANGEID" bigint NULL DEFAULT NULL,
  "CHANGEIDEND" bigint NOT NULL,
  "TYPEID" integer NOT NULL,
  "VALUE" varchar(128) NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL
);

COMMENT ON TABLE "STEADS_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "STEADS_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "STEADS_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "STEADS_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "STEADS_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "STEADS_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "STEADS_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "STEADS_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "STEADS_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "STEADS_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

