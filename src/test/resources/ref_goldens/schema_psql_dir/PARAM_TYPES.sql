-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783569                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "PARAM_TYPES";
CREATE TABLE "PARAM_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(50) NOT NULL,
  "CODE" varchar(50) NOT NULL,
  "DESC" varchar(120) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("ID")
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

