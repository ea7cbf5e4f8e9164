-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783837                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "CARPLACES";
CREATE TABLE "CARPLACES" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "NUMBER" varchar(50) NOT NULL,
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

COMMENT ON TABLE "CARPLACES" IS 'Fixture set for CARPLACES';
COMMENT ON COLUMN "CARPLACES"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "CARPLACES"."OBJECTID" IS 'Глобальный уникальный идентификатор машино-места';
COMMENT ON COLUMN "CARPLACES"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "CARPLACES"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "CARPLACES"."NUMBER" IS 'Номер машиноместа';
COMMENT ON COLUMN "CARPLACES"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "CARPLACES"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "CARPLACES"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "CARPLACES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "CARPLACES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "CARPLACES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "CARPLACES"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "CARPLACES"."ISACTIVE" IS 'Признак действующего адресного объекта';

