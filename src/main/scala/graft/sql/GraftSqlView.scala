package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan}
import org.apache.spark.sql.execution.command.{CreateViewCommand, LeafRunnableCommand}

/** SQL views over graft tables (r11 verdict missing #2): `CREATE [OR
  * REPLACE] VIEW v AS SELECT ... FROM <registered graft name>`
  * registers `v` in a process-global VIEW registry (the
  * [[GraftSqlTables]] shared-metastore scoping applied to views), and
  * every later reference to `v` RE-PARSES the stored body text and
  * splices it inline — so the view re-resolves to the table's LATEST
  * snapshot on every query (a Spark temp view would freeze the analyzed
  * plan, i.e. the snapshot live at CREATE time — historically wrong the
  * moment the next commit lands), outer predicates and projections push
  * straight through into the manifest-planned parquet scan
  * (PlanShapeSpec-pinned — the body is inlined BEFORE optimization, so
  * there is no materialization fence), and a self-join of the view gets
  * fresh expression ids per reference for free (each reference parses
  * its own tree).
  *
  * Only statements whose body actually references a registered graft
  * name (table or view, subqueries included) are claimed; everything
  * else stays Spark's. Clauses the registry cannot store — column
  * lists, COMMENT, TBLPROPERTIES — are rejected loudly (the DDL knob
  * discipline), and a body whose view references form a CYCLE is
  * rejected at CREATE time (expansion would otherwise loop the
  * analyzer).
  */
object GraftSqlViews {

  private val reg =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Serializes every cross-registry check-then-claim: view cycle-walk +
    * registration (GraftCreateViewCommand), table claim
    * (GraftSqlDdl.claim) and table rename-target claim — the one lock
    * that makes the table/view ONE-namespace invariant atomic across
    * the two registries (ADVICE, r12). */
  private[sql] val createLock = new Object

  private def keyOf(parts: Seq[String]): String =
    parts.map(_.toLowerCase(java.util.Locale.ROOT)).mkString(".")

  /** With a catalog root configured ([[GraftCatalog]]) views persist
    * like tables: the stored artifact is the BODY TEXT itself (views
    * re-parse their body on every reference, so text is the complete
    * durable state), written through on register, loaded on miss. */
  def register(name: Seq[String], bodySql: String): Unit = {
    val k = keyOf(name)
    reg.put(k, bodySql)
    GraftCatalog.writeThrough(GraftCatalog.Views, k, bodySql)
  }

  def registerIfAbsent(name: Seq[String], bodySql: String): Boolean = {
    val k = keyOf(name)
    if (reg.putIfAbsent(k, bodySql).isDefined) false
    else if (GraftCatalog.claim(GraftCatalog.Views, k, bodySql)) true
    else {
      reg.remove(k, bodySql)
      GraftCatalog.load(GraftCatalog.Views, k)
        .foreach(winner => reg.putIfAbsent(k, winner))
      false
    }
  }

  def unregister(name: Seq[String]): Boolean = {
    val k = keyOf(name)
    val inProc = reg.remove(k).isDefined
    val onDisk = GraftCatalog.delete(GraftCatalog.Views, k)
    inProc || onDisk
  }

  def lookup(name: Seq[String]): Option[String] =
    if (name.isEmpty) None
    else {
      val k = keyOf(name)
      reg.get(k).orElse(
        GraftCatalog.load(GraftCatalog.Views, k)
          .map(b => reg.putIfAbsent(k, b).getOrElse(b)))
    }

  /** Every registered view name (normalized lowercase dotted form) —
    * the `SHOW VIEWS IN graft` enumeration, cache ∪ durable catalog. */
  def names: Seq[String] =
    (reg.keySet ++ GraftCatalog.listKeys(GraftCatalog.Views)).toSeq

  /** Does `plan` reference any registered graft table or view name
    * (subquery expressions included)? — the claim test for the splice. */
  private[sql] def referencesGraft(plan: LogicalPlan): Boolean =
    plan.collectWithSubqueries {
      case u: UnresolvedRelation
          if GraftSqlTables.lookup(u.multipartIdentifier).isDefined ||
            lookup(u.multipartIdentifier).isDefined => u
    }.nonEmpty

  private[sql] def referencedNames(
      spark: SparkSession, bodySql: String): Seq[Seq[String]] =
    spark.sessionState.sqlParser.parseQuery(bodySql)
      .collectWithSubqueries { case u: UnresolvedRelation =>
        u.multipartIdentifier
      }

  /** Loud cycle detection at CREATE time: walk view references
    * transitively as if `name` were already bound to `bodySql`,
    * erroring on ANY cycle along the walk path — not just one returning
    * to `name` — so even a cycle that slipped in through a registry
    * misuse outside the command path is caught before the analyzer
    * would expand it forever. Under [[createLock]] no committed cycle
    * can form, so this doubles as the loud second line of defense. */
  private[sql] def requireAcyclic(spark: SparkSession,
      name: Seq[String], bodySql: String): Unit = {
    def walk(body: String, path: Set[String]): Unit =
      referencedNames(spark, body).foreach { ref =>
        val k = keyOf(ref)
        if (path(k))
          throw new IllegalArgumentException(
            s"CREATE VIEW ${name.mkString(".")}: the view body reaches " +
              s"'$k' cyclically through its view references")
        reg.get(k).foreach(walk(_, path + k))
      }
    walk(bodySql, Set(keyOf(name)))
  }

  /** Parser-seam splice (called from [[GraftSqlDdl.splice]]'s caller
    * chain): CREATE [TEMP] VIEW / DROP VIEW statements that involve
    * graft names become graft commands; everything else passes
    * through. */
  def splice(plan: LogicalPlan): Option[LogicalPlan] = plan match {
    // temp/local view form — the parser hands a CreateViewCommand. The
    // TEMP qualifier is REJECTED loudly, not silently widened: graft's
    // view registry is process-global (shared-metastore scoping), and
    // honoring "TEMP" by registering there would leak a contractually
    // session-isolated name to every session in the JVM — the same
    // silently-droppable-clause bug the knob discipline exists for.
    case c: CreateViewCommand if c.originalText.isDefined &&
        referencesGraft(c.plan) =>
      throw new IllegalArgumentException(
        s"CREATE TEMP VIEW ${c.name.nameParts.mkString(".")} over graft " +
          "names is not supported: graft views are process-global " +
          "(shared-metastore scoping) and cannot honor session-local " +
          "TEMP semantics — use CREATE VIEW")
    // persistent form — CreateView over an UnresolvedIdentifier
    case c: CreateView if c.originalText.isDefined &&
        referencesGraft(c.query) =>
      c.child match {
        case UnresolvedIdentifier(parts, _) =>
          requireStorable("CREATE VIEW", parts,
            c.userSpecifiedColumns.isEmpty, c.comment.isEmpty,
            c.properties.isEmpty)
          Some(GraftCreateViewCommand(parts, c.originalText.get,
            c.allowExisting, c.replace))
        case _ => None
      }
    case DropView(UnresolvedIdentifier(parts, _), ifExists)
        if lookup(parts).isDefined =>
      Some(GraftDropViewCommand(parts, ifExists))
    case _ => None
  }

  private def requireStorable(what: String, parts: Seq[String],
      noCols: Boolean, noComment: Boolean, noProps: Boolean): Unit = {
    val name = parts.mkString(".")
    require(noCols, s"$what $name over graft tables does not take a " +
      "column list — alias in the body's SELECT")
    require(noComment, s"$what $name does not store a COMMENT")
    require(noProps, s"$what $name does not store TBLPROPERTIES")
  }
}

/** Registers the view body TEXT under the name; the claim is atomic
  * like CREATE TABLE's (two concurrent CREATE VIEWs of one name produce
  * exactly one success). */
case class GraftCreateViewCommand(parts: Seq[String], bodySql: String,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val name = parts.mkString(".")
    // the cycle walk and the registration form ONE atomic step: two
    // concurrent CREATE OR REPLACEs could otherwise each pass the walk
    // against the other's OLD body, register a→b and b→a, and the next
    // read would expand the cycle until the analyzer stack dies (review
    // finding, r12; the walk itself also errors on any PRE-EXISTING
    // cycle along its path — the loud second line of defense). The
    // TABLE-registry emptiness check sits INSIDE the same lock, which
    // GraftSqlDdl.claim also takes for its inverse check: that makes
    // check+claim atomic ACROSS the two registries, so concurrent
    // CREATE TABLE x / CREATE VIEW x can never both succeed (ADVICE, r12)
    GraftSqlViews.createLock.synchronized {
      require(GraftSqlTables.lookup(parts).isEmpty,
        s"cannot CREATE VIEW '$name': a graft TABLE is bound to that name")
      GraftSqlViews.requireAcyclic(spark, parts, bodySql)
      if (replace) GraftSqlViews.register(parts, bodySql)
      else if (!GraftSqlViews.registerIfAbsent(parts, bodySql)) {
        require(allowExisting,
          s"graft view '$name' already exists (OR REPLACE to overwrite, " +
            "IF NOT EXISTS to ignore)")
      }
    }
    Seq.empty
  }
}

/** `DROP VIEW name` over a registered graft view: unbinds the name. */
case class GraftDropViewCommand(parts: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!GraftSqlViews.unregister(parts))
      require(ifExists, s"graft view '${parts.mkString(".")}' not found")
    Seq.empty
  }
}
