package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format readers mirroring the reference's source layer
  * (SURVEY.md §2.A). All of them are distributed scans: text/CSV file
  * sources partition by file split, record parsing happens per-partition
  * in executors — never a driver-side loop.
  */
object Readers {

  /** A1 — TSV/CSV scan with explicit schema, comment char and separator
    * (reference: `sep="\t", comment="#"` SIFTS reads,
    * process_all_pdb_contacts.py:145,176; 4-space cath-names variant,
    * process_all_pdb_contacts.py:272).
    */
  def tsv(s: SparkSession, path: String, schema: StructType,
          sep: String = "\t", comment: String = "#",
          header: Boolean = false): DataFrame =
    s.read.schema(schema)
      .option("sep", sep).option("comment", comment)
      .option("header", header)
      .csv(path)

  /** A2 — gzip TSV with sentinel-NA control: ONLY the given sentinels are
    * null, nothing else (the reference needs `keep_default_na=False`
    * because sodium's hetCode is literally "NA",
    * produce_neo4j_files.py:105-111). Spark's CSV reader has exactly one
    * nullValue, which is the safe default the reference had to opt into.
    */
  def sentinelTsv(s: SparkSession, path: String, schema: StructType,
                  sentinel: String = "NaN", header: Boolean = false): DataFrame =
    s.read.schema(schema)
      .option("sep", "\t").option("nullValue", sentinel)
      .option("header", header)
      .csv(path)

  /** A7 — flat-record scan: files of `//`-terminated multi-line records
    * (EXPASY enzyme.dat, KEGG, utils.py:28-48, get_ec_information.py:28-91).
    * `lineSep` makes Spark's text source split on the record terminator, so
    * records — not lines — are the scan unit and parsing distributes.
    * Returns one row per record with the raw record body in `record`.
    */
  def flatRecords(s: SparkSession, path: String,
                  recordSep: String = "\n//\n"): DataFrame =
    s.read.option("lineSep", recordSep).text(path)
      .withColumnRenamed("value", "record")
      .filter(trim(col("record")) =!= "")

  /** Parse `KEY  value` lines of a flat record into a map column
    * (2+-space separated tag lines; repeated keys keep the first value,
    * like the reference's stateful parsers). Pure codegen'd expression.
    */
  def recordFields(record: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    map_from_entries(aggregate(
      filter(transform(split(record, "\n"), line =>
        struct(trim(regexp_extract(line, "^(\\S+)\\s\\s+", 1)).as("k"),
          trim(regexp_replace(line, "^\\S+\\s\\s+", "")).as("v"))),
        kv => kv.getField("k") =!= ""),
      array().cast("array<struct<k:string,v:string>>"),
      (acc, kv) => when(exists(acc, e => e.getField("k") === kv.getField("k")), acc)
        .otherwise(array_union(acc, array(kv)))))

  /** A4 — mmCIF category scan (gemmi block.find equivalent,
    * process_pdb_structure.py:56-59): extracts one category's loop_ table
    * from mmCIF text as string columns. Files are read whole (wholetext) —
    * one mmCIF per task, the reference's per-structure parallelism unit —
    * and parsed per-partition.
    */
  def mmcifCategory(s: SparkSession, path: String, category: String): DataFrame = {
    import s.implicits._
    val raw = s.read.option("wholetext", "true").text(path).as[String]
    // every file re-keys its values by ITS OWN declared field order (files
    // may order a category's fields differently, or lack the category);
    // the output schema is the union of field names seen across files —
    // deriving it from one arbitrary file would misalign or drop the rest
    val keyed = raw.flatMap { text =>
      val cols = parseMmcifHeader(text, category)
      parseMmcifLoop(text, category).map(row => cols.zip(row).toMap)
    }.persist()
    // the cache only has to live for the schema-discovery job; unpersist
    // before returning so repeated calls in a long-lived session don't
    // accumulate CacheManager entries. The returned plan re-parses once on
    // its first action — the same two-pass cost as schema inference, and
    // the right trade at scale (the parsed maps of a large corpus may not
    // fit memory anyway).
    val cols =
      try keyed.flatMap(_.keys).distinct().collect().sorted.toSeq
      finally keyed.unpersist(blocking = false)
    if (cols.isEmpty) s.emptyDataFrame
    else keyed.toDF("kv")
      .select(cols.map(c => col("kv").getItem(c).as(c)): _*)
  }

  private[sources] def parseMmcifHeader(text: String, category: String): Seq[String] = {
    val prefix = s"_$category."
    text.linesIterator.filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).trim.takeWhile(!_.isWhitespace)).toSeq
  }

  private[sources] def parseMmcifLoop(text: String, category: String): Seq[Seq[String]] = {
    val prefix = s"_$category."
    val lines = text.linesIterator.toVector
    val fieldIdx = lines.indexWhere(_.startsWith(prefix))
    if (fieldIdx < 0) return Seq.empty
    val nFields = lines.drop(fieldIdx).takeWhile(_.startsWith(prefix)).length
    lines.drop(fieldIdx + nFields)
      .takeWhile(l => !l.startsWith("_") && !l.startsWith("loop_") &&
        !l.startsWith("#") && l.trim.nonEmpty)
      .map(tokenizeCifLine)
      .filter(_.length == nFields)
  }

  /** mmCIF value line tokenizer: whitespace-split with single/double-quote
    * handling (enough for category tables; multiline `;` blocks are out of
    * scope for the fixture-backed categories we read).
    */
  private[sources] def tokenizeCifLine(line: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val end = line.indexOf(c, i + 1)
        val stop = if (end < 0) line.length else end
        out += line.substring(i + 1, stop); i = stop + 1
      } else {
        var j = i
        while (j < line.length && !line(j).isWhitespace) j += 1
        out += line.substring(i, j); i = j
      }
    }
    out.result()
  }

  /** A5 — XML scan (SIFTS per-residue / InterPro shape,
    * process_pdb_contacts.py:220-267): whole-file XML parsed per-partition
    * with the JDK SAX parser; emits one row per `rowTag` element with the
    * requested attributes.
    */
  def xmlAttributes(s: SparkSession, path: String, rowTag: String,
                    attrs: Seq[String]): DataFrame = {
    import s.implicits._
    val raw = s.read.option("wholetext", "true").text(path).as[String]
    val rows = raw.flatMap(parseXmlAttrs(_, rowTag, attrs))
    rows.toDF("row")
      .select(attrs.indices.map(i => col("row").getItem(i).as(attrs(i))): _*)
  }

  private[sources] def parseXmlAttrs(xml: String, rowTag: String,
                                     attrs: Seq[String]): Seq[Seq[String]] = {
    import javax.xml.parsers.SAXParserFactory
    import org.xml.sax.helpers.DefaultHandler
    import org.xml.sax.Attributes
    val out = Vector.newBuilder[Seq[String]]
    val handler = new DefaultHandler {
      override def startElement(uri: String, local: String, qName: String,
                                a: Attributes): Unit =
        if (qName == rowTag)
          out += attrs.map(n => Option(a.getValue(n)).getOrElse(""))
    }
    val f = SAXParserFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newSAXParser.parse(
      new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")), handler)
    out.result()
  }
}
