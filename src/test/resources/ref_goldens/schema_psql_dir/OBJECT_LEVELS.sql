-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783490                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "OBJECT_LEVELS";
CREATE TABLE "OBJECT_LEVELS" (
  "LEVEL" smallint NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "SHORTNAME" varchar(50) NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("LEVEL")
);

COMMENT ON TABLE "OBJECT_LEVELS" IS 'Fixture set for OBJECT_LEVELS';
COMMENT ON COLUMN "OBJECT_LEVELS"."LEVEL" IS 'Уникальный идентификатор уровня. Ключевое поле';
COMMENT ON COLUMN "OBJECT_LEVELS"."NAME" IS 'Наименование';
COMMENT ON COLUMN "OBJECT_LEVELS"."SHORTNAME" IS 'Краткое наименование';
COMMENT ON COLUMN "OBJECT_LEVELS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "OBJECT_LEVELS"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "OBJECT_LEVELS"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "OBJECT_LEVELS"."ISACTIVE" IS 'Признак действующего уровня';

