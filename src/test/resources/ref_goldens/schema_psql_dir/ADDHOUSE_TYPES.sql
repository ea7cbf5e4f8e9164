-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783217                                           --
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
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("ID")
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

