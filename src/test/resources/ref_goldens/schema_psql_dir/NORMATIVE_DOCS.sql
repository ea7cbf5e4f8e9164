-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.784060                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "NORMATIVE_DOCS";
CREATE TABLE "NORMATIVE_DOCS" (
  "ID" bigint NOT NULL,
  "NAME" varchar(128) NOT NULL,
  "DATE" date NOT NULL,
  "NUMBER" varchar(150) NOT NULL,
  "TYPE" integer NOT NULL,
  "KIND" integer NOT NULL,
  "UPDATEDATE" date NOT NULL,
  "ORGNAME" varchar(255) NULL DEFAULT NULL,
  "REGNUM" varchar(100) NULL DEFAULT NULL,
  "REGDATE" date NULL DEFAULT NULL,
  "ACCDATE" date NULL DEFAULT NULL,
  "COMMENT" varchar(128) NULL DEFAULT NULL,
  PRIMARY KEY ("ID")
);

COMMENT ON TABLE "NORMATIVE_DOCS" IS 'Fixture set for NORMATIVE_DOCS';
COMMENT ON COLUMN "NORMATIVE_DOCS"."ID" IS 'Уникальный идентификатор документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."NAME" IS 'Наименование документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."DATE" IS 'Дата документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."NUMBER" IS 'Номер документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."TYPE" IS 'Тип документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."KIND" IS 'Вид документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."UPDATEDATE" IS 'Дата обновления';
COMMENT ON COLUMN "NORMATIVE_DOCS"."ORGNAME" IS 'Наименование органа создавшего нормативный документ';
COMMENT ON COLUMN "NORMATIVE_DOCS"."REGNUM" IS 'Номер государственной регистрации';
COMMENT ON COLUMN "NORMATIVE_DOCS"."REGDATE" IS 'Дата государственной регистрации';
COMMENT ON COLUMN "NORMATIVE_DOCS"."ACCDATE" IS 'Дата вступления в силу нормативного документа';
COMMENT ON COLUMN "NORMATIVE_DOCS"."COMMENT" IS 'Комментарий';

