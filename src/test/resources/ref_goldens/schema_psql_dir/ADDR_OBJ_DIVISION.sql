-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783701                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "ADDR_OBJ_DIVISION";
CREATE TABLE "ADDR_OBJ_DIVISION" (
  "ID" bigint NOT NULL,
  "PARENTID" bigint NOT NULL,
  "CHILDID" bigint NOT NULL,
  "CHANGEID" bigint NOT NULL,
  PRIMARY KEY ("ID")
);

COMMENT ON TABLE "ADDR_OBJ_DIVISION" IS 'Fixture set for ADDR_OBJ_DIVISION';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."ID" IS 'Уникальный идентификатор записи';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."PARENTID" IS 'Родительский ID';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."CHILDID" IS 'Дочерний ID';
COMMENT ON COLUMN "ADDR_OBJ_DIVISION"."CHANGEID" IS 'ID изменившей транзакции';

