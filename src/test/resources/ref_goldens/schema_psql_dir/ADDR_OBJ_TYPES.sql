-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783320                                           --
-- --------------------------------------------------------------------------------- --

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
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("ID")
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

