-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.784011                                           --
-- --------------------------------------------------------------------------------- --

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
  "PATH" varchar(128) NOT NULL,
  PRIMARY KEY ("ID")
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

