-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783948                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "HOUSES";
CREATE TABLE "HOUSES" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "OBJECTGUID" varchar(36) NOT NULL,
  "CHANGEID" bigint NOT NULL,
  "HOUSENUM" varchar(50) NULL DEFAULT NULL,
  "ADDNUM1" varchar(50) NULL DEFAULT NULL,
  "ADDNUM2" varchar(50) NULL DEFAULT NULL,
  "HOUSETYPE" integer NULL DEFAULT NULL,
  "ADDTYPE1" integer NULL DEFAULT NULL,
  "ADDTYPE2" integer NULL DEFAULT NULL,
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

COMMENT ON TABLE "HOUSES" IS 'Fixture set for HOUSES';
COMMENT ON COLUMN "HOUSES"."ID" IS 'Уникальный идентификатор записи. Ключевое поле';
COMMENT ON COLUMN "HOUSES"."OBJECTID" IS 'Глобальный уникальный идентификатор дома';
COMMENT ON COLUMN "HOUSES"."OBJECTGUID" IS 'Глобальный уникальный идентификатор (GUID)';
COMMENT ON COLUMN "HOUSES"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "HOUSES"."HOUSENUM" IS 'Основной номер дома';
COMMENT ON COLUMN "HOUSES"."ADDNUM1" IS 'Дополнительный номер дома 1';
COMMENT ON COLUMN "HOUSES"."ADDNUM2" IS 'Дополнительный номер дома 2';
COMMENT ON COLUMN "HOUSES"."HOUSETYPE" IS 'Основной тип дома';
COMMENT ON COLUMN "HOUSES"."ADDTYPE1" IS 'Дополнительный тип дома 1';
COMMENT ON COLUMN "HOUSES"."ADDTYPE2" IS 'Дополнительный тип дома 2';
COMMENT ON COLUMN "HOUSES"."OPERTYPEID" IS 'Статус действия над записью';
COMMENT ON COLUMN "HOUSES"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "HOUSES"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "HOUSES"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "HOUSES"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "HOUSES"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "HOUSES"."ISACTUAL" IS 'Статус актуальности адресного объекта ФИАС';
COMMENT ON COLUMN "HOUSES"."ISACTIVE" IS 'Признак действующего адресного объекта';

