-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783861                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "CARPLACES_PARAMS";
CREATE TABLE "CARPLACES_PARAMS" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "CHANGEID" bigint NULL DEFAULT NULL,
  "CHANGEIDEND" bigint NOT NULL,
  "TYPEID" integer NOT NULL,
  "VALUE" varchar(128) NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  PRIMARY KEY ("ID")
);

COMMENT ON TABLE "CARPLACES_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "CARPLACES_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "CARPLACES_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "CARPLACES_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "CARPLACES_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "CARPLACES_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "CARPLACES_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "CARPLACES_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "CARPLACES_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "CARPLACES_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

