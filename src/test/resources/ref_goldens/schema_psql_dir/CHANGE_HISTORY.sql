-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783907                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "CHANGE_HISTORY";
CREATE TABLE "CHANGE_HISTORY" (
  "CHANGEID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "ADROBJECTID" varchar(36) NOT NULL,
  "OPERTYPEID" integer NOT NULL,
  "NDOCID" bigint NULL DEFAULT NULL,
  "CHANGEDATE" date NOT NULL,
  PRIMARY KEY ("CHANGEID")
);

COMMENT ON TABLE "CHANGE_HISTORY" IS 'Fixture set for CHANGE_HISTORY';
COMMENT ON COLUMN "CHANGE_HISTORY"."CHANGEID" IS 'ID изменившей транзакции. Ключевое поле';
COMMENT ON COLUMN "CHANGE_HISTORY"."OBJECTID" IS 'Уникальный ID объекта';
COMMENT ON COLUMN "CHANGE_HISTORY"."ADROBJECTID" IS 'Уникальный ID изменившей транзакции (GUID)';
COMMENT ON COLUMN "CHANGE_HISTORY"."OPERTYPEID" IS 'Тип операции';
COMMENT ON COLUMN "CHANGE_HISTORY"."NDOCID" IS 'ID документа';
COMMENT ON COLUMN "CHANGE_HISTORY"."CHANGEDATE" IS 'Дата изменения';

