-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.784124                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "ROOMS";
CREATE TABLE "ROOMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "NUMBER" varchar(50) NOT NULL,
  "ROOMTYPE" integer NOT NULL,
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

COMMENT ON TABLE "ROOMS" IS 'Fixture set for ROOMS';
COMMENT ON COLUMN "ROOMS"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "ROOMS"."OBJECTID" IS 'Глобальный уникальный идентификатор комнаты';
COMMENT ON COLUMN "ROOMS"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "ROOMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "ROOMS"."NUMBER" IS 'Номер комнаты или офиса';
COMMENT ON COLUMN "ROOMS"."ROOMTYPE" IS 'Тип комнаты или офиса';
COMMENT ON COLUMN "ROOMS"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "ROOMS"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "ROOMS"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "ROOMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ROOMS"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ROOMS"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ROOMS"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "ROOMS"."ISACTIVE" IS 'Признак действующего адресного объекта';

