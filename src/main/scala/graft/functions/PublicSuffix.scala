package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-Suffix-List-backed registrable domains — the broadcast-join form
  * [[UrlFunctions.registrableDomain]]'s scaladoc promises. The heuristic
  * (last two labels, three under generic-SLD ccTLDs) is wrong for the long
  * tail of real suffixes: `github.io` is a public suffix (every user site
  * is its own registrable domain), `gov.uk`'s family extends far past the
  * generic-SLD list, and the `ck` zone is wildcarded with an exception for
  * `www.ck`. Web-corpus pipelines hit these on day one of domain grouping.
  *
  * Rule semantics (the published publicsuffix.org algorithm):
  *  - a normal rule matches a host suffix equal to it;
  *  - a wildcard rule `*.tail` matches any suffix of exactly one label
  *    more than `tail` ending in `tail`;
  *  - an exception rule `!suffix` declares that suffix NOT a public
  *    suffix (its public suffix is its own tail) and overrides everything;
  *  - otherwise the longest matching rule prevails; with no match the
  *    default rule `*` applies (the TLD itself is public).
  *  - registrable domain = public suffix plus one label; a host that IS a
  *    public suffix has none (null). IPv4 literals pass through unchanged
  *    (grouping-key convenience, matching the heuristic).
  *
  * Scale: rules are a tiny broadcast table (~10k rows for the full list);
  * hosts explode into ≤ label-count suffix candidates (map-side), join the
  * broadcast, and elect per host with one aggregate. Run it over DISTINCT
  * hosts and join the mapping back — hosts repeat massively in a crawl, so
  * the election runs once per site, not once per page
  * ([[withRegistrableDomain]] does exactly this).
  *
  * Ship the real, current list as a data file in production — it updates
  * monthly, which is why it belongs in a joined table, not code.
  * [[FixtureLines]] bundles a small representative slice (enough to cover
  * every rule TYPE) for tests and the oracled query.
  */
object PublicSuffix {

  /** Representative PSL slice: plain TLDs, second-level families, private
    * registry suffixes, and the wildcard/exception pair — one of each rule
    * type the parser and matcher must handle.
    */
  val FixtureLines: Seq[String] = Seq(
    "// ===BEGIN ICANN DOMAINS===",
    "com", "net", "org", "io", "co",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "ac.jp", "or.jp",
    "au", "com.au", "net.au", "org.au",
    "us", "de", "fr",
    "*.ck", "!www.ck",
    "",
    "// ===BEGIN PRIVATE DOMAINS===",
    "github.io", "blogspot.com", "s3.amazonaws.com")

  /** Parses PSL lines into the rule table: (kind, key, pub) where
    *  - kind 'n' (normal): key = the rule, matched against full suffixes;
    *  - kind 'w' (wildcard `*.tail`): key = tail, matched against suffix
    *    TAILS (equality there forces the one-extra-label shape);
    *  - kind 'e' (exception `!rule`): key = the rule, full-suffix match;
    *  - pub = label count of the rule's implied PUBLIC suffix (for 'w'
    *    that is the matched suffix itself; for 'e' the rule minus its
    *    first label).
    * Comments (`//`) and blank lines are skipped; rules are lowercased.
    */
  def parseRules(lines: Seq[String]): Seq[(String, String, Int)] =
    lines.map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        if (l.startsWith("!")) {
          val r = l.stripPrefix("!")
          ("e", r, r.count(_ == '.')) // labels(r) - 1
        } else if (l.startsWith("*.")) {
          val t = l.stripPrefix("*.")
          ("w", t, t.count(_ == '.') + 2) // labels(t) + 1
        } else ("n", l, l.count(_ == '.') + 1)
      }

  /** The rule table as a DataFrame ready to broadcast. */
  def rules(spark: SparkSession,
      lines: Seq[String] = FixtureLines): DataFrame = {
    import spark.implicits._
    parseRules(lines).toDF("kind", "key", "pub")
  }

  /** Rules from a PSL text file — the production path (the real list
    * updates monthly and ships as a data file, not code). Reads through
    * Spark so any filesystem works; the collect is bounded by the list
    * itself (~10k lines).
    */
  def rulesFromFile(spark: SparkSession, path: String): DataFrame =
    rules(spark, spark.read.textFile(path).collect().toSeq)

  private val Ipv4 = "^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"

  /** (host, domain) mapping for every distinct host in `hosts` (which must
    * carry a `host` column): explode suffix candidates, broadcast-join the
    * rules, elect exception-first-then-longest, derive the registrable
    * domain. One narrow shuffle (the election groupBy on host).
    */
  def registrableDomains(hosts: DataFrame, ruleTable: DataFrame): DataFrame = {
    // the PSL algorithm compares case-insensitively and the rule table is
    // lowercased at parse — fold hosts the same way (the ORIGINAL host is
    // kept for the output mapping; the derived domain is canonical
    // lowercase, as the published algorithm specifies)
    val lab = hosts.select(col("host")).where(col("host").isNotNull).distinct()
      .withColumn("ls", split(lower(col("host")), "\\."))
      .withColumn("n", size(col("ls")))
    val cand = lab.select(
      col("host"),
      explode(transform(sequence(lit(1), col("n")), i => struct(
        array_join(slice(col("ls"), i, col("n") - i + 1), ".").as("sfx"),
        array_join(slice(col("ls"), i + 1, col("n") - i), ".").as("tail"))))
        .as("c"))
      .select(col("host"), col("c.sfx").as("sfx"), col("c.tail").as("tail"))
    val exact = cand.join(broadcast(ruleTable.filter(col("kind") =!= "w")),
      col("sfx") === col("key"))
    val wild = cand.join(broadcast(ruleTable.filter(col("kind") === "w")),
      col("tail") === col("key"))
    val elected = exact.select(col("host"), col("kind"), col("pub"))
      .unionByName(wild.select(col("host"), col("kind"), col("pub")))
      .groupBy(col("host"))
      .agg(
        max(when(col("kind") === "e", col("pub"))).as("exc_pub"),
        max(when(col("kind") =!= "e", col("pub"))).as("norm_pub"))
    lab.join(elected, Seq("host"), "left")
      .withColumn("pub",
        coalesce(col("exc_pub"), col("norm_pub"), lit(1))) // default rule '*'
      .withColumn("domain",
        when(col("host").rlike(Ipv4), col("host"))
          .when(col("n") <= col("pub"), lit(null).cast("string"))
          .otherwise(array_join(
            slice(col("ls"), col("n") - col("pub"), col("pub") + 1), ".")))
      .select(col("host"), col("domain"))
  }

  /** Adds a PSL-derived registrable-domain column to any frame with a host
    * column: election runs once per DISTINCT host, then joins back — the
    * per-site-not-per-page discipline for crawl-scale inputs.
    */
  def withRegistrableDomain(df: DataFrame, hostCol: String,
      ruleTable: DataFrame, outCol: String = "domain"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already present")
    val mapping = registrableDomains(
      df.select(col(hostCol).as("host")), ruleTable)
      .select(col("host").as("_psl_host"), col("domain").as(outCol))
    df.join(mapping, df(hostCol) === col("_psl_host"), "left")
      .drop("_psl_host")
  }
}
