-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783791                                           --
-- --------------------------------------------------------------------------------- --

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
  "ISACTIVE" boolean NOT NULL,
  PRIMARY KEY ("ID")
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

