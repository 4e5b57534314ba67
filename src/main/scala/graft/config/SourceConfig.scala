package graft.config

/** The source-configuration DSL — the engine's "query language".
  *
  * Shape mirrors the reference DSL
  * (`/root/reference/src/config/sources/sample_source.yaml:4-113`): a
  * source bundles ingestion config, schema mapping/required/transforms,
  * destination layout, warehouse physical design, quality checks, and
  * monitoring thresholds. Parsed once on the driver; the engine compiles
  * it into a declarative DataFrame plan.
  */
final case class SourceConfig(
    name: String,
    sourceType: SourceType,
    description: String = "",
    api: Option[ApiConfig] = None,
    email: Option[EmailConfig] = None,
    stream: Option[StreamConfig] = None,
    schema: SchemaConfig = SchemaConfig(),
    destination: Destination = Destination(),
    warehouse: Option[WarehouseConfig] = None,
    qualityChecks: Seq[QualityCheck] = Nil,
    monitoring: Monitoring = Monitoring(),
    // O8: scheduler expression (sample_source.yaml:26, "rate(1 hour)");
    // evaluated by graft.orchestrate.Scheduler, not by the pipeline run.
    schedule: Option[String] = None,
    // North-star curation pipeline declared in config, compiled onto
    // the corpus operators by graft.transform.CurationCompiler —
    // mirrors how `transformations:` compiles onto T1–T6.
    curation: Option[CurationConfig] = None)

/** Pipeline branch discriminator (workflow_definition.json:15-45). */
sealed trait SourceType
object SourceType {
  case object RestApi extends SourceType
  case object Email extends SourceType
  case object File extends SourceType
  case object Stream extends SourceType
  def parse(s: String): SourceType = s.toLowerCase match {
    case "rest_api" | "api" => RestApi
    case "email"            => Email
    case "file" | "s3"      => File
    case "stream" | "kinesis" | "kafka" => Stream
    case other => throw new IllegalArgumentException(s"Unknown source type: $other")
  }
}

/** Schema section: mapping + required + ordered transformations
  * (sample_source.yaml:33-56).
  *
  * `mapping` is ordered (declaration order matters: later entries see the
  * effect of earlier renames, matching the reference's sequential
  * application, transform_data.py:41-51).
  */
final case class SchemaConfig(
    inputFormat: String = "json",
    mapping: Seq[(String, MappingTarget)] = Nil,
    required: Seq[String] = Nil,
    transformations: Seq[TransformSpec] = Nil,
    maxErrors: Option[Int] = None) // corrupt-record budget (MAXERROR parity)

/** A mapping target: either a (possibly dotted) source path, or a
  * struct-valued target built from sub-mappings — the declared
  * nested-target semantics (sample_source.yaml:39-43) that the reference
  * code would crash on (SURVEY.md P3); implemented correctly here.
  */
sealed trait MappingTarget
object MappingTarget {
  final case class Path(sourcePath: String) extends MappingTarget
  final case class Struct(fields: Seq[(String, MappingTarget)]) extends MappingTarget
}

/** One entry of the ordered `transformations` list
  * (transform_data.py:55-90). Unknown `kind`s are skipped silently —
  * that IS the contract (transform_data.py:66-67).
  */
final case class TransformSpec(
    field: String,
    kind: String,
    format: Option[String] = None,
    pattern: Option[String] = None,
    replacement: Option[String] = None)

final case class DestinationZone(
    bucket: String = "",
    prefix: String = "",
    format: String = "parquet",
    partitionBy: Seq[String] = Nil) {
  def path: String = if (bucket.isEmpty) prefix else s"$bucket/$prefix"
}

final case class Destination(
    raw: Option[DestinationZone] = None,
    processed: Option[DestinationZone] = None)

/** REST-API source config (sample_source.yaml:12-30,
  * api_ingestion/handler.py:101-273).
  */
final case class ApiConfig(
    endpoint: String,
    method: String = "GET",
    headers: Map[String, String] = Map.empty,
    parameters: Map[String, String] = Map.empty,
    body: Option[String] = None,
    pagination: Option[PaginationConfig] = None,
    timeoutSeconds: Int = 30,
    retry: RetryConfig = RetryConfig(),
    auth: Option[AuthConfig] = None)

/** Pagination modes (api_ingestion/handler.py:144-275): offset/limit,
  * page-number, or next-token-at-dotted-path.
  */
final case class PaginationConfig(
    enabled: Boolean = true,
    style: String = "offset",         // offset | page | next_token
    limitParam: String = "limit",
    offsetParam: String = "offset",
    pageParam: String = "page",
    nextUrlPath: String = "next",     // dotted path into the JSON response
    maxPages: Int = 10)               // reference default: handler.py:162

final case class RetryConfig(
    attempts: Int = 3,
    backoff: String = "exponential",
    baseSeconds: Double = 1.0)

/** basic / bearer auth (api_ingestion/handler.py:118-131). */
final case class AuthConfig(
    authType: String,                 // basic | bearer
    username: Option[String] = None,
    password: Option[String] = None,
    token: Option[String] = None)

/** Streaming source/pipeline config (SURVEY §2.8; the reference
  * declares the stream branch in README.md:11,56 and
  * workflow_definition.json:77-81). `format: kafka` reads a broker
  * topic; any file format streams a landing prefix (the S3-event
  * analog). A set `windowDuration` turns on the tumbling event-time
  * aggregate; `dedupKeys` turns on dropDuplicatesWithinWatermark.
  */
final case class StreamConfig(
    format: String = "json",
    landingPath: String = "",
    brokers: String = "",
    topic: String = "",
    streamName: String = "", // kinesis transport (README.md:11)
    region: String = "",
    watermarkColumn: String = "ts",
    watermarkDelay: String = "10 minutes",
    windowDuration: Option[String] = None,
    dedupKeys: Seq[String] = Nil,
    checkpointDir: String = "",
    outputPath: String = "",
    maxFilesPerTrigger: Int = 100)

/** Declarative training-data curation (the LLM-pipeline extension of
  * the reference's config DSL): quality gate → dedup → temperature mix
  * → context-window chunking → token-budget sharding, each stage an
  * existing library operator with its parameters lifted into config.
  * `dedup`: "exact" | "none"; `mix`: temperature-flatten the stratum
  * distribution before chunking.
  */
final case class CurationConfig(
    idField: String = "doc_id",
    textField: String = "text",
    stratumField: String = "lang",
    minTokens: Long = 10,
    maxTokens: Long = 5000,
    minStopRatio: Double = 0.01,
    dedup: String = "exact",
    mix: Boolean = true,
    chunkTokens: Int = 32,
    chunkOverlap: Int = 8,
    shardBudget: Long = 2048,
    shardBucketWidth: Long = 64L << 20,
    semanticDedup: Option[SemanticDedupConfig] = None,
    similarity: Option[SimilarityConfig] = None,
    decontam: Option[DecontamConfig] = None,
    dsir: Option[DsirConfig] = None,
    substrDedup: Option[SubstrDedupConfig] = None,
    lmBuckets: Option[LmBucketsConfig] = None,
    gopher: Option[GopherConfig] = None,
    c4: Option[C4Config] = None,
    charset: Option[CharsetConfig] = None,
    html: Option[HtmlConfig] = None)

/** `curation.semantic_dedup:` — embedding-space (SemDeDup) dedup over
  * the corpus's sibling embedding table, reachable from pure config.
  * `policy`: "min_id" keeps each near-duplicate neighborhood's lowest
  * id; "best" keeps the best `quality_field` value (ties → lowest id).
  * The ANN index geometry is NOT a config knob by design — it derives
  * from the corpus via [[graft.ext.SimSearch.IvfParams.forCorpus]], so
  * a config cannot pin a fixture-tuned index onto 100 TB.
  */
final case class SemanticDedupConfig(
    tau: Double = 0.4,
    policy: String = "min_id",
    qualityField: String = "label")

/** `curation.similarity:` — ANN top-k serving declared in pure config.
  * The index CHOICE is not a config knob: it derives from corpus size
  * by the documented [[graft.transform.CurationCompiler.dispatchFor]]
  * rule (small → exact brute, medium → trained IVF, huge → PQ codes),
  * the same way index GEOMETRY already derives via
  * [[graft.ext.SimSearch.IvfParams.forCorpus]] — a config cannot pin a
  * fixture-tuned index choice onto 100 TB. `cand_where` is an optional
  * SQL predicate over the embedding table's metadata columns
  * (filtered serving); absent means unrestricted candidates.
  * `eval_recall: true` turns the section into the index's QUALITY
  * GRADE: the same dispatched serving shape is measured against exact
  * brute-force ground truth ([[graft.ext.AnnEval.recallAtK]]) instead
  * of being returned — the declarative form of "report this index's
  * recall@k before I ship it".
  */
final case class SimilarityConfig(
    queryBound: Int = 100,
    k: Int = 5,
    candWhere: Option[String] = None,
    evalRecall: Boolean = false,
    retrainWhen: Option[RetrainWhenConfig] = None)

/** `similarity: retrain_when:` — the declarative retrain policy that
  * closes the index-maintenance loop: `ivf_cell_stats` measures,
  * this section DECIDES. Integer thresholds (a percent and a ratio) so
  * the decision is hash-exact across engines: retrain when any cell's
  * delta share exceeds `max_delta_pct` percent, or when cell
  * populations diverge beyond `max_cell_ratio`. Compiled by
  * [[graft.transform.CurationCompiler.compileRetrainSignal]] (dry-run
  * decision frame) and acted on by
  * [[graft.ext.IvfIndex.maintainIndex]] (check → retrain → rebuild →
  * atomic versioned swap).
  */
final case class RetrainWhenConfig(
    maxDeltaPct: Int = 50,
    maxCellRatio: Int = 8)

/** `curation.decontam:` — eval-set decontamination: flag corpus
  * documents sharing ≥ `min_shared` distinct `shingle_len`-shingles
  * with a held-out benchmark. `eval_where` is a SQL predicate over the
  * document table selecting the eval rows (everything else is corpus).
  */
final case class DecontamConfig(
    evalWhere: String,
    shingleLen: Int = 3,
    minShared: Int = 3)

/** `curation.dsir:` — DSIR importance resampling toward a target
  * distribution ([[graft.ext.Dsir]]). `target_where` is a SQL
  * predicate over the document table naming the target rows; when
  * absent the curation section's own quality gate
  * (min_tokens/max_tokens/min_stop_ratio) defines the target — the
  * self-contained form. `keep_num` scales P(keep) ≈
  * min(1, keep_num/100 · importance ratio).
  */
final case class DsirConfig(
    keepNum: Int = 25,
    targetWhere: Option[String] = None)

/** `curation.substr_dedup:` — exact duplicated-substring removal
  * ([[graft.ext.SubstrDedup]], Lee et al. suffix-array semantics):
  * every `window_len`-token run occurring twice anywhere in the corpus
  * is cut from all but its canonical first occurrence.
  */
final case class SubstrDedupConfig(
    windowLen: Int = 8)

/** `curation.gopher:` — the Gopher/MassiveText heuristic battery
  * ([[graft.ext.GopherRules]]); `flag_only` keeps every document and
  * lands the rule columns (the audit shape), false filters to
  * passing documents (the gate shape). `line_rules` switches to the
  * LINE-shaped half of the published battery
  * ([[graft.ext.GopherRules.lineRules]] — bullet/ellipsis line
  * fractions over '\n'-segmented text) instead of the word battery.
  */
final case class GopherConfig(
    flagOnly: Boolean = true,
    lineRules: Boolean = false,
    repetition: Boolean = false)

/** `curation.charset:` — the charset/script sanity profile
  * ([[graft.ext.ScriptProfile]]): encoding-damage counts and the
  * Latin-majority `clean` gate. `flag_only` follows the gopher
  * convention (audit columns vs filtered gate).
  */
final case class CharsetConfig(
    flagOnly: Boolean = true)

/** `curation.html:` — HTML/boilerplate extraction
  * ([[graft.ext.HtmlStrip]]) before the word-level batteries:
  * script/style blocks drop with content, tags become spaces, the six
  * common entities decode. `min_clean_chars` drops documents whose
  * EXTRACTED text is shorter than the floor (markup-only pages); 0 =
  * pure transform.
  */
final case class HtmlConfig(
    minCleanChars: Long = 0)

/** `curation.c4:` — the C4 cleaning-rule battery (Raffel et al. 2020
  * §2.2, [[graft.ext.C4Rules]]): terminal-punctuation line retention,
  * ≥5-word lines, javascript-line drops, and the lorem-ipsum / curly-
  * brace / blocklist page flags. `block_words` is the deployment's
  * word blocklist (the paper's list is config, not code); `flag_only`
  * follows the gopher convention (audit columns vs filtered gate).
  */
final case class C4Config(
    blockWords: Seq[String],
    flagOnly: Boolean = true)

/** `curation.lm_buckets:` — CCNet-style per-language head/middle/tail
  * quality terciles by bigram bit-length cross-entropy
  * ([[graft.ext.LmBuckets]]). `ref_where` is a SQL predicate over the
  * document table naming the reference (LM-training) rows; when absent
  * the curation section's own quality gate defines the reference —
  * the same self-contained convention as `dsir.target_where`.
  */
final case class LmBucketsConfig(
    langField: String = "lang",
    refWhere: Option[String] = None)

/** Email-attachment source (email_processor/handler.py:26-58,165-169). */
final case class EmailConfig(
    allowedSenders: Seq[String] = Nil,
    allowedExtensions: Seq[String] = Seq(".csv", ".json", ".parquet"),
    landingPrefix: String = "")

/** Warehouse physical design (sample_source.yaml:74-82): distkey →
  * repartition, sortkey → sortWithinPartitions, vacuum/analyze →
  * maintenance.
  */
final case class WarehouseConfig(
    schema: String,
    table: String,
    distkey: Option[String] = None,
    sortkey: Seq[String] = Nil,
    vacuumStrategy: String = "auto",
    analyze: Boolean = true,
    // Schema evolution gate (K7): additive columns are always allowed;
    // dropping or retyping a published column fails the publish unless
    // this opts in (mirrors the reference's information_schema check
    // before COPY — redshift_loader/handler.py:102-118).
    allowColumnEvolution: Boolean = false) {
  def qualified: String = s"${schema}_$table" // session-catalog-safe name
}

/** Quality checks (sample_source.yaml:85-95). */
final case class QualityCheck(
    kind: String,                     // not_null | unique | regex
    columns: Seq[String] = Nil,
    pattern: Option[String] = None)

final case class MetricSpec(
    name: String,
    threshold: Double,
    comparison: String = "GreaterThan",
    evaluationPeriods: Int = 1)

final case class Monitoring(
    metrics: Seq[MetricSpec] = Nil,
    notifications: Seq[NotificationSpec] = Nil)

final case class NotificationSpec(
    kind: String,                     // email | slack
    recipients: Seq[String] = Nil,
    channel: Option[String] = None)
