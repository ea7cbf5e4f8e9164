-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.784088                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "REESTR_OBJECTS";
CREATE TABLE "REESTR_OBJECTS" (
  "OBJECTID" bigint NOT NULL,
  "CREATEDATE" date NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "LEVELID" integer NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("OBJECTID")
);

COMMENT ON TABLE "REESTR_OBJECTS" IS 'Fixture set for REESTR_OBJECTS';
COMMENT ON COLUMN "REESTR_OBJECTS"."OBJECTID" IS 'Уникальный идентификатор объекта. Ключевое поле';
COMMENT ON COLUMN "REESTR_OBJECTS"."CREATEDATE" IS 'Дата создания';
COMMENT ON COLUMN "REESTR_OBJECTS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "REESTR_OBJECTS"."LEVELID" IS 'Уровень объекта';
COMMENT ON COLUMN "REESTR_OBJECTS"."UPDATEDATE" IS 'Дата обновления';
COMMENT ON COLUMN "REESTR_OBJECTS"."OBJECTGUID" IS 'GUID объекта';
COMMENT ON COLUMN "REESTR_OBJECTS"."ISACTIVE" IS 'Признак действующего объекта';

