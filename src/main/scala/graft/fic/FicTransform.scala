package graft.fic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{PyRound, Similarity, SpanishDate}

/** Bank→fund→URL lookup (the reference's `fics.json`,
  * /root/reference/src/etl/transform.py:205-223). Declared as ordered
  * sequences because the reference iterates JSON-object insertion order
  * when scanning for containment / best-score matches — a Map would lose
  * the deterministic tie behavior.
  */
final case class FicLookup(banks: Seq[(String, Seq[(String, String)])])
    extends Serializable {
  def isEmpty: Boolean = banks.isEmpty
}

/** The FIC transform chain — the reference's 8 passes
  * (/root/reference/src/etl/transform.py:19-68) as one
  * DataFrame → DataFrame function.
  *
  * Spark-first design (SURVEY §3.2): every pass is a narrow per-row
  * projection; pass 1's per-category aggregate runs INSIDE the row via
  * array higher-order functions (`aggregate`/`filter`/`transform`), so
  * the whole chain is shuffle-free — at 100 TB it is a single
  * scan→project stage. The only non-built-in pieces are `py_round`
  * (a codegen'd Catalyst expression for CPython rounding parity) and
  * three scalar UDFs (Spanish dates, fuzzy agency match, fuzzy URL
  * lookup) whose semantics are inherently procedural string algorithms.
  *
  * Divergence from the reference, by design: string-typed participation
  * values inside a category would crash the reference's format inference
  * (`sum()` over mixed types, transform.py:549); here they are parsed
  * first and participate normally — repair-not-crash per SURVEY §7.8.
  */
object FicTransform {

  /** Recognized rating agencies (transform.py:12-16). Declared order is
    * the containment-scan order: the reference iterates a Python set
    * (nondeterministic); we fix the order so that the observed golden
    * outputs reproduce (difflib's cutoff path is order-independent —
    * ties resolve to the lexicographically greatest candidate).
    */
  val Agencies: Seq[String] = Seq(
    "FITCH RATINGS", "FITCH", "STANDARD & POOR'S", "S&P",
    "MOODY'S", "DBRS", "BRC", "BRC INVESTOR SERVICES",
    "VALORA", "VALORAMERICA", "CEC", "CEPAL", "ICFC")

  /** Bank-filename → fics.json-key alias map (transform.py:275-295). */
  val BankAliases: Map[String, String] = Map(
    "bancodebogota" -> "bancoDeBogota",
    "bancodeoccidentefiduoccidente" -> "bancoDeOccidenteFiduoccidente",
    "credicorpcapital" -> "credicorpCapital",
    "bancolombia" -> "bancolombia",
    "bbva" -> "bbva",
    "davivienda" -> "davivienda",
    "bancoagrario" -> "bancoAgrario",
    "bancoavvillas" -> "bancoAvVillas",
    "bancocajasocial" -> "bancoCajaSocial",
    "bancoomeva" -> "bancoomeva",
    "bancoopular" -> "bancoPopular",
    "bancofinandina" -> "bancolombia",
    "bancopichincha" -> "bancoPichincha",
    "bancoreservas" -> "bancoDeBogota",
    "bancoinsa" -> "insa",
    "cititrust" -> "citiTrust",
    "gnbsudameris" -> "gnbSudameris",
    "scotiabankcolpatria" -> "scotiabankColpatria")

  /** Aggressive fund-name normalization (transform.py:306-325):
    * lowercase, then SEQUENTIAL substring removal in this exact order
    * (order matters: later tokens may appear only after earlier ones are
    * removed, e.g. "altaliquidez" → "tiquiz").
    */
  private val FundStripTokens: Seq[String] = Seq(
    "fondodeinversioncolectiva", "fic", "abierto", "cerrado",
    "de", "y", "en", "la", "el", "los", "las", "del", "al",
    " ", "-", "_", ".", ",", ";", ":", "!", "?", "(", ")", "[", "]")

  def normalizeFundName(name: String): String = {
    var n = name.toLowerCase
    FundStripTokens.foreach(t => n = n.replace(t, ""))
    n
  }

  private def squash(s: String): String =
    s.toLowerCase.replace(" ", "").replace("-", "").replace("_", "")

  /** `_normalizar_nombre_banco` (transform.py:270-303). */
  def normalizeBankName(bancoLower: String): String =
    BankAliases.getOrElse(squash(bancoLower), bancoLower)

  /** `_buscar_banco_coincidente` (transform.py:358-384): exact squashed
    * → containment (lookup order) → difflib cutoff 0.6.
    */
  def matchBank(banco: String, keys: Seq[String]): Option[String] = {
    val bn = squash(banco)
    // single ordered loop checking exact OR containment per candidate —
    // the reference returns the FIRST candidate satisfying either, so an
    // earlier containment match beats a later exact match
    keys.find { k =>
      val kn = squash(k)
      kn == bn || bn.contains(kn) || kn.contains(bn)
    }.orElse(Similarity.closeMatch(banco, keys, 0.6))
  }

  /** `_buscar_coincidencia_difusa` (transform.py:712-733): difflib
    * cutoff 0.8 (order-independent — ties resolve to the greatest
    * string), then substring containment. The reference's containment
    * scan iterates a Python set, whose order varies with the process
    * hash seed — observed to flip e.g. FITCH vs FITCH RATINGS for
    * 'FITCH RATINGS COLOMBIA'. We fix a deterministic policy: scan
    * shortest candidate first (most general name wins), equal lengths in
    * reverse alphabetical order — this matches the reference's
    * majority-seed behavior on every observed input (e.g.
    * 'BRC RATINGS - S&P GLOBAL' → S&P).
    */
  private val AgenciesByLength =
    Agencies.sortBy(a => (a.length, a))(
      Ordering.Tuple2(Ordering.Int, Ordering.String.reverse))

  def matchAgency(entUpper: String): Option[String] = {
    if (entUpper == null || entUpper.isEmpty) return None
    Similarity.closeMatch(entUpper, Agencies, 0.8)
      .orElse(AgenciesByLength.find(o => entUpper.contains(o) || o.contains(entUpper)))
  }

  /** Fund-level URL pick (transform.py:226-259): exact normalized match
    * short-circuits; otherwise best strictly-improving score > 0.7 in
    * lookup order.
    */
  def pickFundUrl(fundNorm: String, funds: Seq[(String, String)]): Option[String] = {
    var bestUrl: Option[String] = None
    var bestScore = 0.0
    val it = funds.iterator
    while (it.hasNext) {
      val (key, url) = it.next()
      val kn = normalizeFundName(key)
      val score = Similarity.lcsSimilarity(fundNorm, kn)
      if (kn == fundNorm) return Some(url)
      else if (score > bestScore && score > 0.7) { bestUrl = Some(url); bestScore = score }
    }
    bestUrl
  }

  /** Full URL enrichment from the filename (transform.py:171-269). */
  def urlForFilename(filename: String, lookup: FicLookup): Option[String] = {
    if (filename == null || !filename.contains("_")) return None
    val parts = filename.split("_")
    if (parts.length < 3) return None
    val fund = parts.slice(1, parts.length - 1).mkString("_")
    val bancoRaw = parts(0).toLowerCase
    val bancoNorm = normalizeBankName(bancoRaw)
    matchBank(bancoNorm, lookup.banks.map(_._1)).flatMap { bankKey =>
      val funds = lookup.banks.find(_._1 == bankKey).map(_._2).getOrElse(Nil)
      pickFundUrl(normalizeFundName(fund), funds)
    }
  }

  /** `limpiar_valor` (transform.py:70-86): ÷1000 while > 1e6, then
    * CPython round(·, 2). The iterative division is kept (each step
    * rounds in IEEE) — a closed-form pow division would differ in ulps.
    */
  def limpiarValor(v: java.lang.Double): java.lang.Double = {
    if (v == null) return null
    var x = v.doubleValue()
    if (x == 0.0) return 0.0
    while (x > 1000000.0) x /= 1000.0
    PyRound.round(x, 2)
  }

  // ---------------------------------------------------------------------
  // SQL fragments (pass 1) — evaluated entirely inside the row.
  // ---------------------------------------------------------------------

  /** Parse a string-or-number percentage. The schema reads numeric
    * leaves as strings, so JSON NUMBER tokens (incl. exponent notation)
    * arrive as number-literal text and take the direct cast — matching
    * the reference's float branch. Everything else takes the reference's
    * STRING branch: strip all but [0-9.,%-], comma→dot; a surviving '%'
    * fails the parse → null (transform.py:592-597), and 'NaN'/'Infinity'
    * strings clean to unparseable → null, exactly like Python.
    */
  private def numberLit(x: String): String =
    s"trim($x) rlike '^-?[0-9]+(\\\\.[0-9]+)?([eE][+-]?[0-9]+)?$$'"

  private def parseSql(x: String): String =
    s"case when ${numberLit(x)} then cast(trim($x) as double) " +
      s"else try_cast(replace(regexp_replace(trim($x), '[^0-9.,%-]', ''), ',', '.') as double) end"

  /** Let-binding for SQL fragments: evaluate `value` ONCE, expose it to
    * `body` as lambda variable `v`. A plain alias column would be
    * re-INLINED at every use site by CollapseProject once the projects
    * merge (each alias is referenced once per use site, so the collapse
    * fires) — and an alias referenced inside a HOF lambda body is then
    * re-evaluated PER ELEMENT. A lambda variable cannot be inlined away,
    * so the hoist survives every optimizer pass. The wrapper is two
    * O(1) array ops per row.
    */
  private def bind1(value: String, v: String, body: String): String =
    s"element_at(transform(array($value), $v -> $body), 1)"

  /** Category format inference (`_determinar_formato_categoria`,
    * transform.py:537-566) over the parsed values of one array column.
    * The parsed-values array and its sum are [[bind1]]-bound: inlining
    * them at each of the 6 use sites octuples the expression tree (the
    * pre-r15 planning cost of f37) and re-runs the whole-array
    * aggregation per branch.
    */
  private def formatSql(arr: String): String = {
    val vals = s"filter(transform($arr, it -> ${parseSql("it.participacion")}), v -> v is not null)"
    bind1(vals, "__vs", bind1(
      "aggregate(__vs, cast(0 as double), (a, v) -> a + v)", "__sum",
      """
      CASE
        WHEN size(filter(__vs, v -> v > cast(1 as double))) >
             size(filter(__vs, v -> v <= cast(1 as double)))
             AND __sum BETWEEN 90 AND 110 THEN 'x100'
        WHEN size(filter(__vs, v -> v <= cast(1 as double))) >
             size(filter(__vs, v -> v > cast(1 as double)))
             AND __sum BETWEEN 0.9 AND 1.1 THEN '/100'
        WHEN __sum BETWEEN 90 AND 110 THEN 'x100'
        WHEN __sum BETWEEN 0.9 AND 1.1 THEN '/100'
        ELSE 'desconocido'
      END"""))
  }

  /** Smart per-value conversion (`_convertir_porcentaje_inteligente` +
    * `_convertir_porcentaje_individual`, transform.py:572-632) given the
    * category format.
    */
  private def convertSql(v: String, fmt: String): String =
    s"""
      CASE
        WHEN $v IS NULL THEN NULL
        WHEN $fmt = 'x100' THEN py_round($v / 100.0, 6)
        WHEN $fmt = '/100' THEN py_round($v, 6)
        WHEN abs($v) BETWEEN 0.9 AND 1.1 THEN py_round($v, 6)
        WHEN abs($v) BETWEEN 90 AND 110 THEN py_round($v / 100.0, 6)
        WHEN abs($v) > 1.1 THEN py_round($v / 100.0, 6)
        ELSE py_round($v, 6)
      END"""

  /** One percentage array rebuilt with its category format applied.
    * The category format is [[bind1]]-bound OUTSIDE the element lambda
    * — evaluated once per row, never per element — and each element's
    * parsed value is bound once inside it (r15: a fmt hoisted into a
    * separate column was re-inlined into the lambda by CollapseProject,
    * re-running the whole-array format aggregation per element).
    */
  private def pctArraySql(arr: String, key: String): String =
    bind1(formatSql(arr), "__f",
      s"""transform($arr, it -> named_struct(
         '$key', it.$key,
         'participacion', ${bind1(parseSql("it.participacion"), "__v",
           convertSql("__v", "__f"))}))""")

  /** Simple conversion for returns/volatilities
    * (`_convertir_si_es_necesario`, transform.py:635-661).
    */
  private def simpleConvSql(x: String): String =
    bind1(parseSql(x), "__v",
      """CASE WHEN __v IS NULL THEN NULL
            WHEN abs(__v) > 1.0 THEN py_round(__v / 100.0, 6)
            ELSE py_round(__v, 6) END""")

  private def horizonsSql(st: String): String =
    "named_struct(" + Seq("ultimo_mes", "ultimos_6_meses", "anio_corrido",
      "ultimo_anio", "ultimos_2_anios", "ultimos_3_anios")
      .map(h => s"'$h', ${simpleConvSql(s"$st.$h")}").mkString(", ") + ")"

  /** `_parse_numero` (transform.py:790-805): number tokens cast
    * directly (the reference's float branch); strings strip all but
    * [0-9.-] and cast.
    */
  private def parseNumeroSql(x: String): String =
    s"case when ${numberLit(x)} then cast(trim($x) as double) " +
      s"else try_cast(regexp_replace(trim($x), '[^0-9.-]', '') as double) end"

  // ---------------------------------------------------------------------
  // The chain.
  // ---------------------------------------------------------------------

  /** Apply the 8-pass transform. `df` must carry a `filename` column
    * plus the [[FicSchema.raw]] top-level columns.
    */
  def apply(df: DataFrame, lookup: FicLookup): DataFrame = {
    val spark = df.sparkSession
    PyRound.register(spark)

    val parseDateUdf = udf { s: String =>
      // falsy values pass through UNCHANGED ("" stays "", null stays
      // null) — the reference's `if fecha_val` guard skips them
      if (s == null || s.isEmpty) s
      else {
        val p = SpanishDate.parse(s)
        if (p != null) p else s
      }
    }
    val agencyUdf = udf { ent: String => matchAgency(ent).orNull }
    val lk = lookup
    val urlUdf = udf { filename: String => urlForFilename(filename, lk).orNull }
    val limpiarUdf = udf { v: java.lang.Double => limpiarValor(v) }

    val compCats = Seq(
      "por_activo" -> "activo", "por_tipo_de_renta" -> "tipo",
      "por_sector_economico" -> "sector", "por_pais_emisor" -> "pais",
      "por_moneda" -> "moneda", "por_calificacion" -> "calificacion")

    // -- pass 1: percentages --------------------------------------------
    // category formats bound ONCE PER ROW inside each rebuild expression
    // ([[bind1]] — lambda-bound, so no optimizer pass can push them back
    // into the element lambdas the way the r14 fmt pre-columns were)
    val rvRebuild = expr(
      s"""transform(rentabilidad_volatilidad, rv -> named_struct(
         'tipo_de_participacion', rv.tipo_de_participacion,
         'rentabilidad_historica_ea', ${horizonsSql("rv.rentabilidad_historica_ea")},
         'volatilidad_historica', ${horizonsSql("rv.volatilidad_historica")}))""")

    // ONE projection for all 8 passes (r16, VERDICT #5): after the r15
    // batching (15 withColumn → 4 withColumns) the residual f37 cost
    // was the 4 remaining ANALYZER walks over the large nested-lambda
    // tree. Every pass reads only ORIGINAL df columns (pass 7's
    // calificacion write touches a field pass 2 passes through
    // unchanged; pass 8's repairs read the pass-1 arrays, which fold as
    // coalesce/when around the pass-1 expressions — each used exactly
    // once, so nothing is duplicated), so the whole chain is a single
    // withColumns and the analyzer walks the tree ONCE. The optimizer
    // already collapsed the 4 projections into one physical Project
    // (bind1 keeps the hoists), so the executed plan is unchanged —
    // this cuts planning time only. Per-pass semantics are pinned by
    // the FIC golden suites and the f37 oracle.
    //
    // Pass-8 fold equivalences (each checked against the r15 shape):
    //  - pctArraySql(arr) and rvRebuild are null iff their input array
    //    is null (transform(null) = null), so
    //    coalesce(rebuild(arr), empty) == pass-8's
    //    coalesce(pass-1 output, empty);
    //  - composicion: pass 1 produced when(isNotNull, compRebuild) —
    //    i.e. null iff the struct was null — and pass 8 re-wrapped
    //    per-cat with coalesce; the fold evaluates compRebuild's
    //    per-cat expression once inside the coalesce.
    val entOrig = col("calificacion.entidad_calificadora")
    val applied = entOrig.isNotNull && entOrig =!= ""
    val matched = agencyUdf(upper(trim(entOrig)))
    val urlCol =
      if (lookup.isEmpty) lit(null).cast("string") else urlUdf(col("filename"))
    val emptyPct = (key: String) =>
      expr(s"cast(array() as array<struct<$key:string,participacion:double>>)")
    df.withColumns(Map(
      // passes 1 + 8: percentage rebuilds with structural repair folded
      "plazo_duracion" ->
        coalesce(expr(pctArraySql("plazo_duracion", "plazo")), emptyPct("plazo")),
      "principales_inversiones" ->
        coalesce(expr(pctArraySql("principales_inversiones", "emisor")),
          emptyPct("emisor")),
      "rentabilidad_volatilidad" ->
        coalesce(rvRebuild, expr(
          """cast(array() as array<struct<
             tipo_de_participacion:string,
             rentabilidad_historica_ea:struct<ultimo_mes:double,ultimos_6_meses:double,anio_corrido:double,ultimo_anio:double,ultimos_2_anios:double,ultimos_3_anios:double>,
             volatilidad_historica:struct<ultimo_mes:double,ultimos_6_meses:double,anio_corrido:double,ultimo_anio:double,ultimos_2_anios:double,ultimos_3_anios:double>>>)""")),
      "composicion_portafolio" ->
        when(col("composicion_portafolio").isNull,
          expr("named_struct(" + compCats.map { case (cat, key) =>
            s"'$cat', cast(array() as array<struct<$key:string,participacion:double>>)"
          }.mkString(", ") + ")"))
        .otherwise(expr("named_struct(" + compCats.map { case (cat, key) =>
          s"'$cat', coalesce(${pctArraySql(s"composicion_portafolio.$cat", key)}, " +
            s"cast(array() as array<struct<$key:string,participacion:double>>))"
        }.mkString(", ") + ")")),
      // pass 2 + pass-7 date field (untouched by pass 2) composed
      "calificacion" -> col("calificacion")
        .withField("entidad_calificadora",
          when(applied && matched.isNotNull, matched).otherwise(entOrig))
        .withField("entidad_calificadora_normalizada",
          when(applied, matched.isNotNull).otherwise(lit(null).cast("boolean")))
        .withField("fecha_ultima_calificacion",
          parseDateUdf(col("calificacion.fecha_ultima_calificacion"))),
      // passes 3+4+7 (dates; numerics; monetary rescale — valor composes
      // parse-then-limpiar in one field write) and 5+6 (fic tipo + url)
      "fic" -> col("fic")
        .withField("fecha_corte", parseDateUdf(col("fic.fecha_corte")))
        .withField("tipo", tipoFicExpr(col("fic.politica_de_inversion")))
        .withField("url", urlCol),
      "caracteristicas" -> col("caracteristicas")
        .withField("fecha_inicio_operaciones",
          parseDateUdf(col("caracteristicas.fecha_inicio_operaciones")))
        .withField("valor",
          limpiarUdf(expr(parseNumeroSql("caracteristicas.valor"))))
        .withField("no_unidades_en_circulacion",
          expr(parseNumeroSql("caracteristicas.no_unidades_en_circulacion")))))
  }

  /** `_extraer_tipo_fic` (transform.py:107-169): keyword votes per fund
    * type, argmax in declared order with a content-based fallback chain.
    * Pure column expressions — no UDF.
    */
  def tipoFicExpr(politicaCol: Column): Column = {
    val politica = lower(coalesce(politicaCol, lit("")))

    val keywords: Seq[(String, Seq[String])] = Seq(
      "Renta Fija" -> Seq("renta fija", "bonos", "cdt", "certificado de depósito",
        "tes", "títulos de deuda", "deuda pública", "tasa fija", "fixed income",
        "instrumentos de deuda", "papeles comerciales", "obligaciones"),
      "Renta Variable" -> Seq("renta variable", "acciones", "equity",
        "bolsa de valores", "mercado accionario", "stocks", "índices accionarios",
        "participaciones", "capitalización bursátil"),
      "Mixta" -> Seq("mixta", "balanced", "balanceado", "combinado",
        "renta fija y variable", "fija y variable", "diversificado",
        "multiactivo", "multi-activo"),
      "Alternativa" -> Seq("alternativa", "alternative", "hedge fund",
        "fondos de cobertura", "private equity", "capital privado",
        "inmobiliario", "real estate", "commodities", "materias primas",
        "infraestructura", "derivados", "divisas", "forex", "opciones", "futuros"))

    def votes(ws: Seq[String]): Column =
      ws.map(w => when(politica.contains(w), 1).otherwise(0))
        .reduce(_ + _)

    val Seq(rf, rv, mx, al) = keywords.map { case (_, ws) => votes(ws) }

    when(rf > 0 && rf >= rv && rf >= mx && rf >= al, "Renta Fija")
      .when(rv > 0 && rv >= mx && rv >= al, "Renta Variable")
      .when(mx > 0 && mx >= al, "Mixta")
      .when(al > 0, "Alternativa")
      .when(politica.contains("renta fija") && politica.contains("renta variable"), "Mixta")
      .when(politica.contains("renta fija"), "Renta Fija")
      .when(politica.contains("renta variable"), "Renta Variable")
      .when(politica.contains("alternativa") || politica.contains("hedge") ||
        politica.contains("private equity") || politica.contains("inmobiliario"),
        "Alternativa")
      .otherwise("Desconocido")
  }
}
