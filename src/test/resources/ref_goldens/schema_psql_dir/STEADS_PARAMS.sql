-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.784268                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "STEADS_PARAMS";
CREATE TABLE "STEADS_PARAMS" (
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

COMMENT ON TABLE "STEADS_PARAMS" IS 'Fixture set for PARAM';
COMMENT ON COLUMN "STEADS_PARAMS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "STEADS_PARAMS"."OBJECTID" IS 'Глобальный уникальный идентификатор адресного объекта';
COMMENT ON COLUMN "STEADS_PARAMS"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "STEADS_PARAMS"."CHANGEIDEND" IS 'ID завершившей транзакции';
COMMENT ON COLUMN "STEADS_PARAMS"."TYPEID" IS 'Тип параметра';
COMMENT ON COLUMN "STEADS_PARAMS"."VALUE" IS 'Значение параметра';
COMMENT ON COLUMN "STEADS_PARAMS"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "STEADS_PARAMS"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "STEADS_PARAMS"."ENDDATE" IS 'Дата окончания действия записи';

