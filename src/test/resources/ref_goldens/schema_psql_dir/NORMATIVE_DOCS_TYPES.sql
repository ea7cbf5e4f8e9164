-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783449                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "NORMATIVE_DOCS_TYPES";
CREATE TABLE "NORMATIVE_DOCS_TYPES" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  PRIMARY KEY ("ID")
);

COMMENT ON TABLE "NORMATIVE_DOCS_TYPES" IS 'Fixture set for NORMATIVE_DOCS_TYPES';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."NAME" IS 'Наименование';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."STARTDATE" IS 'Дата начала действия записи';
COMMENT ON COLUMN "NORMATIVE_DOCS_TYPES"."ENDDATE" IS 'Дата окончания действия записи';

