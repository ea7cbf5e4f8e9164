-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.784223                                           --
-- --------------------------------------------------------------------------------- --

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
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("ID")
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

