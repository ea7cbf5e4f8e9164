-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783418                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "NORMATIVE_DOCS_KINDS";
CREATE TABLE "NORMATIVE_DOCS_KINDS" (
  "ID" integer NOT NULL,
  "NAME" varchar(250) NOT NULL,
  PRIMARY KEY ("ID")
);

COMMENT ON TABLE "NORMATIVE_DOCS_KINDS" IS 'Fixture set for NORMATIVE_DOCS_KINDS';
COMMENT ON COLUMN "NORMATIVE_DOCS_KINDS"."ID" IS 'Идентификатор записи';
COMMENT ON COLUMN "NORMATIVE_DOCS_KINDS"."NAME" IS 'Наименование';

