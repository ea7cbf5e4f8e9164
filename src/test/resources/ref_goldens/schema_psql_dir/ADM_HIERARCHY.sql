-- --------------------------------------------------------------------------------- --
-- ru_address v2.2.1 -- get latest version at https://github.com/shadz3rg/ru_address --
-- generated at 2026-08-16 18:49:04.783766                                           --
-- --------------------------------------------------------------------------------- --

DROP TABLE IF EXISTS "ADM_HIERARCHY";
CREATE TABLE "ADM_HIERARCHY" (
  "ID" bigint NOT NULL,
  "OBJECTID" bigint NOT NULL,
  "PARENTOBJID" bigint NULL DEFAULT NULL,
  "CHANGEID" bigint NOT NULL,
  "REGIONCODE" varchar(4) NULL DEFAULT NULL,
  "AREACODE" varchar(4) NULL DEFAULT NULL,
  "CITYCODE" varchar(4) NULL DEFAULT NULL,
  "PLACECODE" varchar(4) NULL DEFAULT NULL,
  "PLANCODE" varchar(4) NULL DEFAULT NULL,
  "STREETCODE" varchar(4) NULL DEFAULT NULL,
  "PREVID" bigint NULL DEFAULT NULL,
  "NEXTID" bigint NULL DEFAULT NULL,
  "UPDATEDATE" date NOT NULL,
  "STARTDATE" date NOT NULL,
  "ENDDATE" date NOT NULL,
  "ISACTIVE" boolean NOT NULL,
  "PATH" varchar(128) NOT NULL,
  PRIMARY KEY ("ID")
);

COMMENT ON TABLE "ADM_HIERARCHY" IS 'Fixture set for ADM_HIERARCHY';
COMMENT ON COLUMN "ADM_HIERARCHY"."ID" IS 'Уникальный идентификатор записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."OBJECTID" IS 'Глобальный уникальный идентификатор объекта';
COMMENT ON COLUMN "ADM_HIERARCHY"."PARENTOBJID" IS 'Идентификатор родительского объекта';
COMMENT ON COLUMN "ADM_HIERARCHY"."CHANGEID" IS 'ID изменившей транзакции';
COMMENT ON COLUMN "ADM_HIERARCHY"."REGIONCODE" IS 'Код региона';
COMMENT ON COLUMN "ADM_HIERARCHY"."AREACODE" IS 'Код района';
COMMENT ON COLUMN "ADM_HIERARCHY"."CITYCODE" IS 'Код города';
COMMENT ON COLUMN "ADM_HIERARCHY"."PLACECODE" IS 'Код населенного пункта';
COMMENT ON COLUMN "ADM_HIERARCHY"."PLANCODE" IS 'Код ЭПС';
COMMENT ON COLUMN "ADM_HIERARCHY"."STREETCODE" IS 'Код улицы';
COMMENT ON COLUMN "ADM_HIERARCHY"."PREVID" IS 'Идентификатор записи связывания с предыдущей исторической записью';
COMMENT ON COLUMN "ADM_HIERARCHY"."NEXTID" IS 'Идентификатор записи связывания с последующей исторической записью';
COMMENT ON COLUMN "ADM_HIERARCHY"."UPDATEDATE" IS 'Дата внесения (обновления) записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."STARTDATE" IS 'Начало действия записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."ENDDATE" IS 'Окончание действия записи';
COMMENT ON COLUMN "ADM_HIERARCHY"."ISACTIVE" IS 'Признак действующего адресного объекта';
COMMENT ON COLUMN "ADM_HIERARCHY"."PATH" IS 'Материализованный путь к объекту (полная иерархия)';

