-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783594                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "ROOM_TYPES";
CREATE TABLE "ROOM_TYPES" (
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

COMMENT ON TABLE "ROOM_TYPES" IS 'Fixture set for ROOM_TYPES';
COMMENT ON COLUMN "ROOM_TYPES"."ID" IS 'Идентификатор типа (ключ)';
COMMENT ON COLUMN "ROOM_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "ROOM_TYPES"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "ROOM_TYPES"."DESC" IS 'Описание';
COMMENT ON COLUMN "ROOM_TYPES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ROOM_TYPES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ROOM_TYPES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ROOM_TYPES"."ISACTIVE" IS 'Статус активности';

