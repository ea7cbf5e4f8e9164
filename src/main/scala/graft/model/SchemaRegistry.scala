package graft.model

import org.apache.spark.sql.types._

/**
 * The GAR schema registry — the engine's analog of the reference's XSD-driven
 * `Definition` (/root/reference/ru_address/source/xml.py:82-122) plus
 * `Core.KNOWN_ENTITIES` / table lists (/root/reference/ru_address/core.py:8-65)
 * and the key metadata (/root/reference/ru_address/resources/index.xml).
 *
 * Schemas are fixed and external (never inferred from data): 22 physical
 * entities, 28 logical tables (10 common + 18 region; the five *_PARAMS
 * tables share entity PARAM, ADDHOUSE_TYPES shares HOUSE_TYPES — core.py:33-65).
 * Field order is authoritative: projection iterates these fields, exactly as
 * the reference iterates XSD attributes (xml.py:25).
 */
object SchemaRegistry {

  /** Field spec: XSD-derived type info kept in StructField metadata. */
  private case class F(name: String, t: DataType, required: Boolean = false,
      maxLen: Int = 0, comment: String = "")

  private def field(f: F): StructField = {
    val mb = new MetadataBuilder()
    if (f.maxLen > 0) mb.putLong("maxLength", f.maxLen.toLong)
    if (f.comment.nonEmpty) mb.putString("comment", f.comment)
    StructField(f.name, f.t, nullable = !f.required, mb.build())
  }

  private val L = LongType      // xs:long / totalDigits 19
  private val I = IntegerType   // totalDigits 10
  private val S = ShortType     // totalDigits 5
  private val D = DateType
  private val B = BooleanType
  private def str(n: Int) = StringType // length carried via maxLen metadata

  private def dictFields(idComment: String): Seq[F] = Seq(
    F("ID", I, required = true, comment = idComment),
    F("NAME", str(250), required = true, maxLen = 250, comment = "Наименование"),
    F("SHORTNAME", str(50), maxLen = 50, comment = "Краткое наименование"),
    F("DESC", str(250), maxLen = 250, comment = "Описание"),
    F("UPDATEDATE", D, required = true, comment = "Дата внесения (обновления) записи"),
    F("STARTDATE", D, required = true, comment = "Начало действия записи"),
    F("ENDDATE", D, required = true, comment = "Окончание действия записи"),
    F("ISACTIVE", B, required = true, comment = "Статус активности"))

  private def changeableTail: Seq[F] = Seq(
    F("OPERTYPEID", I, required = true, comment = "Статус действия над записью"),
    F("PREVID", L, comment = "Идентификатор записи связывания с предыдущей исторической записью"),
    F("NEXTID", L, comment = "Идентификатор записи связывания с последующей исторической записью"),
    F("UPDATEDATE", D, required = true, comment = "Дата внесения (обновления) записи"),
    F("STARTDATE", D, required = true, comment = "Начало действия записи"),
    F("ENDDATE", D, required = true, comment = "Окончание действия записи"),
    F("ISACTUAL", B, required = true, comment = "Статус актуальности адресного объекта ФИАС"),
    F("ISACTIVE", B, required = true, comment = "Признак действующего адресного объекта"))

  private def objHead(what: String): Seq[F] = Seq(
    F("ID", L, required = true, comment = s"Уникальный идентификатор записи. Ключевое поле"),
    F("OBJECTID", L, required = true, comment = s"Глобальный уникальный идентификатор $what"),
    F("OBJECTGUID", str(36), required = true, maxLen = 36, comment = "Глобальный уникальный идентификатор (GUID)"),
    F("CHANGEID", L, required = true, comment = "ID изменившей транзакции"))

  /** Entity name -> ordered field list (the 22 physical XSD entities). */
  val entities: Map[String, Seq[StructField]] = Map(
    "ADDR_OBJ" -> (objHead("адресного объекта") ++ Seq(
      F("NAME", str(250), required = true, maxLen = 250, comment = "Наименование"),
      F("TYPENAME", str(50), required = true, maxLen = 50, comment = "Краткое наименование типа объекта"),
      F("LEVEL", str(10), required = true, maxLen = 10, comment = "Уровень адресного объекта")) ++ changeableTail),
    "ADDR_OBJ_DIVISION" -> Seq(
      F("ID", L, required = true, comment = "Уникальный идентификатор записи"),
      F("PARENTID", L, required = true, comment = "Родительский ID"),
      F("CHILDID", L, required = true, comment = "Дочерний ID"),
      F("CHANGEID", L, required = true, comment = "ID изменившей транзакции")),
    "ADDR_OBJ_TYPES" -> (Seq(
      F("ID", I, required = true, comment = "Идентификатор записи"),
      F("LEVEL", S, required = true, comment = "Уровень адресного объекта")) ++ dictFields("").tail),
    "ADM_HIERARCHY" -> Seq(
      F("ID", L, required = true, comment = "Уникальный идентификатор записи"),
      F("OBJECTID", L, required = true, comment = "Глобальный уникальный идентификатор объекта"),
      F("PARENTOBJID", L, comment = "Идентификатор родительского объекта"),
      F("CHANGEID", L, required = true, comment = "ID изменившей транзакции"),
      F("REGIONCODE", str(4), maxLen = 4, comment = "Код региона"),
      F("AREACODE", str(4), maxLen = 4, comment = "Код района"),
      F("CITYCODE", str(4), maxLen = 4, comment = "Код города"),
      F("PLACECODE", str(4), maxLen = 4, comment = "Код населенного пункта"),
      F("PLANCODE", str(4), maxLen = 4, comment = "Код ЭПС"),
      F("STREETCODE", str(4), maxLen = 4, comment = "Код улицы"),
      F("PREVID", L, comment = "Идентификатор записи связывания с предыдущей исторической записью"),
      F("NEXTID", L, comment = "Идентификатор записи связывания с последующей исторической записью"),
      F("UPDATEDATE", D, required = true, comment = "Дата внесения (обновления) записи"),
      F("STARTDATE", D, required = true, comment = "Начало действия записи"),
      F("ENDDATE", D, required = true, comment = "Окончание действия записи"),
      F("ISACTIVE", B, required = true, comment = "Признак действующего адресного объекта"),
      F("PATH", StringType, required = true, comment = "Материализованный путь к объекту (полная иерархия)")),
    "APARTMENT_TYPES" -> dictFields("Идентификатор типа помещения"),
    "APARTMENTS" -> (objHead("помещения") ++ Seq(
      F("NUMBER", str(50), required = true, maxLen = 50, comment = "Номер помещения"),
      F("APARTTYPE", I, required = true, comment = "Тип помещения")) ++ changeableTail),
    "CARPLACES" -> (objHead("машино-места") ++ Seq(
      F("NUMBER", str(50), required = true, maxLen = 50, comment = "Номер машиноместа")) ++ changeableTail),
    "CHANGE_HISTORY" -> Seq(
      F("CHANGEID", L, required = true, comment = "ID изменившей транзакции. Ключевое поле"),
      F("OBJECTID", L, required = true, comment = "Уникальный ID объекта"),
      F("ADROBJECTID", str(36), required = true, maxLen = 36, comment = "Уникальный ID изменившей транзакции (GUID)"),
      F("OPERTYPEID", I, required = true, comment = "Тип операции"),
      F("NDOCID", L, comment = "ID документа"),
      F("CHANGEDATE", D, required = true, comment = "Дата изменения")),
    "HOUSE_TYPES" -> dictFields("Идентификатор"),
    "HOUSES" -> (objHead("дома") ++ Seq(
      F("HOUSENUM", str(50), maxLen = 50, comment = "Основной номер дома"),
      F("ADDNUM1", str(50), maxLen = 50, comment = "Дополнительный номер дома 1"),
      F("ADDNUM2", str(50), maxLen = 50, comment = "Дополнительный номер дома 2"),
      F("HOUSETYPE", I, comment = "Основной тип дома"),
      F("ADDTYPE1", I, comment = "Дополнительный тип дома 1"),
      F("ADDTYPE2", I, comment = "Дополнительный тип дома 2")) ++ changeableTail),
    "MUN_HIERARCHY" -> Seq(
      F("ID", L, required = true, comment = "Уникальный идентификатор записи"),
      F("OBJECTID", L, required = true, comment = "Глобальный уникальный идентификатор адресного объекта"),
      F("PARENTOBJID", L, comment = "Идентификатор родительского объекта"),
      F("CHANGEID", L, required = true, comment = "ID изменившей транзакции"),
      F("OKTMO", str(11), maxLen = 11, comment = "Код ОКТМО"),
      F("PREVID", L, comment = "Идентификатор записи связывания с предыдущей исторической записью"),
      F("NEXTID", L, comment = "Идентификатор записи связывания с последующей исторической записью"),
      F("UPDATEDATE", D, required = true, comment = "Дата внесения (обновления) записи"),
      F("STARTDATE", D, required = true, comment = "Начало действия записи"),
      F("ENDDATE", D, required = true, comment = "Окончание действия записи"),
      F("ISACTIVE", B, required = true, comment = "Признак действующего адресного объекта"),
      F("PATH", StringType, required = true, comment = "Материализованный путь к объекту (полная иерархия)")),
    "NORMATIVE_DOCS" -> Seq(
      F("ID", L, required = true, comment = "Уникальный идентификатор документа"),
      F("NAME", StringType, required = true, comment = "Наименование документа"),
      F("DATE", D, required = true, comment = "Дата документа"),
      F("NUMBER", str(150), required = true, maxLen = 150, comment = "Номер документа"),
      F("TYPE", I, required = true, comment = "Тип документа"),
      F("KIND", I, required = true, comment = "Вид документа"),
      F("UPDATEDATE", D, required = true, comment = "Дата обновления"),
      F("ORGNAME", str(255), maxLen = 255, comment = "Наименование органа создавшего нормативный документ"),
      F("REGNUM", str(100), maxLen = 100, comment = "Номер государственной регистрации"),
      F("REGDATE", D, comment = "Дата государственной регистрации"),
      F("ACCDATE", D, comment = "Дата вступления в силу нормативного документа"),
      F("COMMENT", StringType, comment = "Комментарий")),
    "NORMATIVE_DOCS_KINDS" -> Seq(
      F("ID", I, required = true, comment = "Идентификатор записи"),
      F("NAME", str(250), required = true, maxLen = 250, comment = "Наименование")),
    "NORMATIVE_DOCS_TYPES" -> Seq(
      F("ID", I, required = true, comment = "Идентификатор записи"),
      F("NAME", str(250), required = true, maxLen = 250, comment = "Наименование"),
      F("STARTDATE", D, required = true, comment = "Дата начала действия записи"),
      F("ENDDATE", D, required = true, comment = "Дата окончания действия записи")),
    "OBJECT_LEVELS" -> Seq(
      F("LEVEL", S, required = true, comment = "Уникальный идентификатор уровня. Ключевое поле"),
      F("NAME", str(250), required = true, maxLen = 250, comment = "Наименование"),
      F("SHORTNAME", str(50), maxLen = 50, comment = "Краткое наименование"),
      F("UPDATEDATE", D, required = true, comment = "Дата внесения (обновления) записи"),
      F("STARTDATE", D, required = true, comment = "Начало действия записи"),
      F("ENDDATE", D, required = true, comment = "Окончание действия записи"),
      F("ISACTIVE", B, required = true, comment = "Признак действующего уровня")),
    "OPERATION_TYPES" -> dictFields("Идентификатор статуса (ключ)"),
    "PARAM" -> Seq(
      F("ID", L, required = true, comment = "Идентификатор записи"),
      F("OBJECTID", L, required = true, comment = "Глобальный уникальный идентификатор адресного объекта"),
      F("CHANGEID", L, comment = "ID изменившей транзакции"),
      F("CHANGEIDEND", L, required = true, comment = "ID завершившей транзакции"),
      F("TYPEID", I, required = true, comment = "Тип параметра"),
      F("VALUE", StringType, required = true, comment = "Значение параметра"),
      F("UPDATEDATE", D, required = true, comment = "Дата внесения (обновления) записи"),
      F("STARTDATE", D, required = true, comment = "Дата начала действия записи"),
      F("ENDDATE", D, required = true, comment = "Дата окончания действия записи")),
    "PARAM_TYPES" -> Seq(
      F("ID", I, required = true, comment = "Идентификатор типа параметра (ключ)"),
      F("NAME", str(50), required = true, maxLen = 50, comment = "Наименование"),
      F("CODE", str(50), required = true, maxLen = 50, comment = "Краткое наименование"),
      F("DESC", str(120), maxLen = 120, comment = "Описание"),
      F("UPDATEDATE", D, required = true, comment = "Дата внесения (обновления) записи"),
      F("STARTDATE", D, required = true, comment = "Начало действия записи"),
      F("ENDDATE", D, required = true, comment = "Окончание действия записи"),
      F("ISACTIVE", B, required = true, comment = "Статус активности")),
    "REESTR_OBJECTS" -> Seq(
      F("OBJECTID", L, required = true, comment = "Уникальный идентификатор объекта. Ключевое поле"),
      F("CREATEDATE", D, required = true, comment = "Дата создания"),
      F("CHANGEID", L, required = true, comment = "ID изменившей транзакции"),
      F("LEVELID", I, required = true, comment = "Уровень объекта"),
      F("UPDATEDATE", D, required = true, comment = "Дата обновления"),
      F("OBJECTGUID", str(36), required = true, maxLen = 36, comment = "GUID объекта"),
      F("ISACTIVE", B, required = true, comment = "Признак действующего объекта")),
    "ROOM_TYPES" -> dictFields("Идентификатор типа (ключ)"),
    "ROOMS" -> (objHead("комнаты") ++ Seq(
      F("NUMBER", str(50), required = true, maxLen = 50, comment = "Номер комнаты или офиса"),
      F("ROOMTYPE", I, required = true, comment = "Тип комнаты или офиса")) ++ changeableTail),
    "STEADS" -> (objHead("земельного участка") ++ Seq(
      F("NUMBER", str(250), maxLen = 250, comment = "Номер земельного участка")) ++ changeableTail)
  ).map { case (k, v) => k -> v.map(field) }

  /** Logical common tables -> entity (core.py:33-44). */
  val commonTables: Seq[(String, String)] = Seq(
    "ADDHOUSE_TYPES" -> "HOUSE_TYPES",
    "ADDR_OBJ_TYPES" -> "ADDR_OBJ_TYPES",
    "APARTMENT_TYPES" -> "APARTMENT_TYPES",
    "HOUSE_TYPES" -> "HOUSE_TYPES",
    "NORMATIVE_DOCS_KINDS" -> "NORMATIVE_DOCS_KINDS",
    "NORMATIVE_DOCS_TYPES" -> "NORMATIVE_DOCS_TYPES",
    "OBJECT_LEVELS" -> "OBJECT_LEVELS",
    "OPERATION_TYPES" -> "OPERATION_TYPES",
    "PARAM_TYPES" -> "PARAM_TYPES",
    "ROOM_TYPES" -> "ROOM_TYPES")

  /** Logical region tables -> entity (core.py:46-65). */
  val regionTables: Seq[(String, String)] = Seq(
    "ADDR_OBJ" -> "ADDR_OBJ",
    "ADDR_OBJ_DIVISION" -> "ADDR_OBJ_DIVISION",
    "ADDR_OBJ_PARAMS" -> "PARAM",
    "ADM_HIERARCHY" -> "ADM_HIERARCHY",
    "APARTMENTS" -> "APARTMENTS",
    "APARTMENTS_PARAMS" -> "PARAM",
    "CARPLACES" -> "CARPLACES",
    "CARPLACES_PARAMS" -> "PARAM",
    "CHANGE_HISTORY" -> "CHANGE_HISTORY",
    "HOUSES" -> "HOUSES",
    "HOUSES_PARAMS" -> "PARAM",
    "MUN_HIERARCHY" -> "MUN_HIERARCHY",
    "NORMATIVE_DOCS" -> "NORMATIVE_DOCS",
    "REESTR_OBJECTS" -> "REESTR_OBJECTS",
    "ROOMS" -> "ROOMS",
    "ROOMS_PARAMS" -> "PARAM",
    "STEADS" -> "STEADS",
    "STEADS_PARAMS" -> "PARAM")

  /** All 28 logical tables in output order (common first — ORD-1). */
  val knownTables: Seq[(String, String)] = commonTables ++ regionTables

  def entityOf(table: String): String =
    knownTables.toMap.getOrElse(table, sys.error(s"unknown GAR table $table"))

  def schemaOf(table: String): StructType = StructType(entities(entityOf(table)))

  /** Primary keys (resources/index.xml: ID everywhere except three tables). */
  def primaryKey(table: String): String = table match {
    case "OBJECT_LEVELS" => "LEVEL"
    case "CHANGE_HISTORY" => "CHANGEID"
    case "REESTR_OBJECTS" => "OBJECTID"
    case _ => "ID"
  }
}
