-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783657                                           --
-- --------------------------------------------------------------------------------- --

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
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("ID")
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

