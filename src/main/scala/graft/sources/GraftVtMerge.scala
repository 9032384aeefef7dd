package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.graftshim.PlanShim
import org.apache.spark.sql.types.StructField

/** SQL `MERGE INTO` for `graftvt` tables — the statement routes to
  * [[VersionedTable.mergeCommit]], so a pure-SQL upsert takes a versioned,
  * optimistically-locked commit exactly like the library path (the Delta
  * architecture: MERGE is an ANALYZER EXTENSION rewriting the resolved
  * [[MergeIntoTable]] into the engine's own command, because Spark's
  * built-in rewrite requires a DSv2 `SupportsRowLevelOperations` table and
  * re-implementing the storage layer under that API would duplicate the
  * commit protocol). Injected via [[graft.plans.GraftExtensions]]
  * (post-hoc resolution — the plan arrives fully resolved, `*` actions
  * already expanded to per-column assignments).
  *
  * Supported statement shapes (each action's translation into the
  * versioned table's key-addressed change-batch contract is exact):
  *   - `WHEN MATCHED [AND c] THEN UPDATE SET *` / full-row assignments
  *   - `WHEN MATCHED [AND c] THEN DELETE`
  *   - `WHEN NOT MATCHED [AND c] THEN INSERT *` / full-row assignments
  * with an ON condition that is a conjunction of same-named target=source
  * column equalities (the table's merge keys). Restrictions, each a clear
  * error: action conditions and assignment values may reference SOURCE
  * columns only (a target-referencing condition would need the matched
  * target ROW, which the key-addressed contract does not carry); every
  * target column must be assigned (partial UPDATE needs target-value
  * retention — use `VersionedTable.mergeCommit` with a pre-joined change
  * batch); the source must be key-unique (SQL's own MERGE cardinality
  * rule, checked distributed before the commit); `WHEN NOT MATCHED BY
  * SOURCE` and `WITH SCHEMA EVOLUTION` are not supported.
  */
final class GraftVtMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      targetOf(m.targetTable) match {
        case Some((lr, rel)) => translate(m, lr, rel)
        case None            => plan
      }
    case _ => plan
  }

  /** The graftvt relation under the MERGE target — [[GraftVtDml.targetOf]]
    * (STRICT: alias/view wrappers only; a filtered AS-SELECT view target
    * must not qualify — its COW rewrite would drop the hidden rows). */
  private def targetOf(plan: LogicalPlan)
      : Option[(LogicalRelation, GraftVtRelation)] =
    GraftVtDml.targetOf(plan)

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"graftvt MERGE: $msg")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  private def translate(m: MergeIntoTable, lr: LogicalRelation,
                        rel: GraftVtRelation): LogicalPlan = {
    GraftVtDml.requireMutable(rel, "MERGE")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported — express the " +
        "sweep as a deleteCommit over an anti-join, or a library mergeCommit")
    if (m.withSchemaEvolution)
      fail("WITH SCHEMA EVOLUTION is not supported — widen the table with " +
        "an append/overwrite commit first")
    val resolver = spark.sessionState.conf.resolver
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet
    // merge keys: every ON conjunct must be target.k = source.k, same name
    val keyCols = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (t, s) =
          if (targetOut.contains(a) && sourceOut.contains(b)) (a, b)
          else if (targetOut.contains(b) && sourceOut.contains(a)) (b, a)
          else fail(s"ON conjunct must pair one target and one source " +
            s"column, got ${a.name} = ${b.name}")
        if (!resolver(t.name, s.name))
          fail(s"ON columns must be same-named (the table's merge keys " +
            s"are addressed by name), got ${t.name} = ${s.name}")
        t.name
      case other =>
        fail(s"ON condition must be a conjunction of column equalities, " +
          s"got: ${other.sql}")
    }
    if (keyCols.isEmpty) fail("ON condition must name at least one key")
    // the change-batch contract addresses rows by (keys, partitions): with
    // every partition column IN the ON keys, a matched pair shares its
    // partition values by construction and the translation is SQL-exact;
    // without them, a source row whose partition differs from the matched
    // target row's would silently address a different (absent) row
    val partitionSpec = rel.tableParameters.getOrElse("partitionCol",
      fail("table must declare a 'partitionCol' option"))
    VersionedTable.partColsOf(partitionSpec).foreach { pc =>
      if (!keyCols.exists(resolver(_, pc)))
        fail(s"ON condition must include the table's partition column " +
          s"'$pc' (rows are addressed by (key, partition); an ON " +
          "without it could silently miss rows whose source partition " +
          "value differs from the matched target row's)")
    }

    // each action: source-only condition, full-row source-only assignments
    def checkCondition(c: Option[Expression], what: String): Unit =
      c.foreach { e =>
        if (!e.references.subsetOf(sourceOut))
          fail(s"$what condition may reference source columns only " +
            s"(target-referencing conditions need the matched target row): " +
            s"${e.sql}")
      }
    def checkAssignments(as: Seq[Assignment], what: String): Unit = {
      val fields = lr.schema.fields
      fields.foreach { f =>
        val a = as.find(x => x.key match {
          case k: Attribute => resolver(k.name, f.name)
          case _            => false
        }).getOrElse(fail(
          s"$what must assign every target column (partial assignment " +
          s"needs target-value retention — use mergeCommit); missing: ${f.name}"))
        if (!a.value.references.subsetOf(sourceOut))
          fail(s"$what value for ${f.name} may reference source columns " +
            s"only: ${a.value.sql}")
      }
    }
    m.matchedActions.foreach {
      case UpdateAction(c, as, _) =>
        checkCondition(c, "WHEN MATCHED UPDATE")
        checkAssignments(as, "WHEN MATCHED UPDATE")
      case DeleteAction(c) => checkCondition(c, "WHEN MATCHED DELETE")
      case other => fail(s"unsupported WHEN MATCHED action: $other")
    }
    m.notMatchedActions.foreach {
      case InsertAction(c, as) =>
        checkCondition(c, "WHEN NOT MATCHED INSERT")
        checkAssignments(as, "WHEN NOT MATCHED INSERT")
      case other => fail(s"unsupported WHEN NOT MATCHED action: $other")
    }

    GraftVtMergeCommand(lr, m.sourceTable, keyCols,
      m.matchedActions, m.notMatchedActions)
  }
}

/** The runnable half: builds the key-addressed change batch from the
  * source plan and the statement's actions, then commits it through
  * [[VersionedTable.mergeCommit]] (partition-granularity COW, optimistic
  * concurrency, time travel across the merge — identical to the library
  * path by construction).
  *
  * Dataflow (scale notes inline):
  *   1. cardinality gate — `SELECT keys HAVING count>1 LIMIT 1` over the
  *      source (SQL MERGE's multiple-source-rows-match error; the
  *      versioned table's change contract is key-addressed, so source
  *      key-uniqueness is required even for inserts);
  *   2. matched flag — left join of the source against the target's
  *      DISTINCT KEY projection, PRUNED to the source's partitions
  *      (manifest-level: only the affected partitions' files are read, and
  *      only the key columns survive column pruning). Skipped entirely for
  *      the two shapes that don't need it: canonical upsert
  *      (unconditional UPDATE-all + INSERT-all — op is 'U' either way) and
  *      unconditional DELETE-only ('D' on an absent key is a no-op);
  *   3. branch select — first-matching-action-wins CASE in declaration
  *      order (SQL's rule), yielding op 'U'/'D' and the action's own
  *      assignment projection per row; rows matching no action drop out;
  *   4. `mergeCommit` — conflict detection, tombstone retirement, and the
  *      new version exactly as the library call.
  */
final case class GraftVtMergeCommand(
    @transient targetRelation: LogicalRelation,
    @transient sourcePlan: LogicalPlan,
    keyCols: Seq[String],
    @transient matchedActions: Seq[MergeAction],
    @transient notMatchedActions: Seq[MergeAction]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val rel = targetRelation.relation.asInstanceOf[GraftVtRelation]
    val path = rel.path
    val partitionCol = rel.tableParameters.getOrElse("partitionCol",
      throw new IllegalArgumentException(
        "graftvt MERGE: table must declare a 'partitionCol' option"))
    val statsCol = rel.tableParameters.get("statsCol")
    val resolver = spark.sessionState.conf.resolver
    // re-resolve the target to latest FIRST (Delta re-resolves at
    // operation start): a stale pin would misclassify matched vs
    // not-matched — a key inserted by an intervening commit would take
    // the INSERT branch instead of its MATCHED action
    rel.refreshSnapshot()
    // materialize the source ONCE: it is otherwise recomputed three times
    // (cardinality gate, partition probe, change-batch write) — 3x the
    // dominant cost for an expensive USING query, and a nondeterministic
    // source could pass the uniqueness gate yet produce duplicates later.
    // localCheckpoint, not persist: a persisted partition can be EVICTED
    // (or lost with its executor) and silently recomputed, so persist
    // alone does not pin a nondeterministic source; a checkpointed
    // partition's loss is an ERROR, never a recompute — Delta materializes
    // its merge source with RDD local checkpointing for exactly this
    // reason. eager=true so the materialization happens here, before the
    // gate reads it.
    val source = PlanShim.ofRows(spark, sourcePlan)
      .localCheckpoint(eager = true)
    try {

    // 1. cardinality gate (distributed; one shuffle over the source)
    val dup = source.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalStateException(
        s"graftvt MERGE: multiple source rows share the key " +
        s"${keyCols.mkString("(", ", ", ")")} = " +
        s"${dup.head.toSeq.init.mkString("(", ", ", ")")} — SQL MERGE " +
        "forbids it and the change batch is key-addressed")

    val fields: Seq[StructField] = rel.schema.fields.toSeq

    def assignmentsOf(a: MergeAction): Option[Seq[Assignment]] = a match {
      case UpdateAction(_, as, _) => Some(as)
      case InsertAction(_, as) => Some(as)
      case _                   => None
    }
    def condOf(a: MergeAction): Option[Expression] = a match {
      case UpdateAction(c, _, _) => c
      case InsertAction(c, _) => c
      case DeleteAction(c)    => c
      case _                  => None
    }
    // the action's full-row projection for one target field: its assigned
    // value (update/insert), or — for DELETE, whose rows only need key +
    // partition addressing — the same-named source column when present
    def valueFor(a: MergeAction, f: StructField) =
      assignmentsOf(a) match {
        case Some(as) =>
          val asn = as.find(_.key match {
            case k: Attribute => resolver(k.name, f.name)
            case _            => false
          }).get // presence validated by the rule
          PlanShim.column(asn.value).cast(f.dataType)
        case None =>
          if (source.columns.exists(resolver(_, f.name)))
            col(f.name).cast(f.dataType)
          else lit(null).cast(f.dataType)
      }
    def opOf(a: MergeAction): String = a match {
      case _: DeleteAction => "D"
      case _               => "U"
    }

    // canonical upsert = one unconditional UPDATE + one unconditional
    // INSERT whose per-column values are semantically IDENTICAL (the `SET *`
    // / `INSERT *` shape): matched-ness never changes the output row, so
    // the flag join is skippable
    val canonicalUpsert = (matchedActions, notMatchedActions) match {
      case (Seq(u @ UpdateAction(None, _, _)), Seq(i @ InsertAction(None, _))) =>
        fields.forall { f =>
          val uv = u.assignments.find(_.key match {
            case k: Attribute => resolver(k.name, f.name); case _ => false
          }).map(_.value)
          val iv = i.assignments.find(_.key match {
            case k: Attribute => resolver(k.name, f.name); case _ => false
          }).map(_.value)
          (uv, iv) match {
            case (Some(a), Some(b)) => a.semanticEquals(b)
            case _                  => false
          }
        }
      case _ => false
    }
    val deleteOnly = notMatchedActions.isEmpty && (matchedActions match {
      case Seq(DeleteAction(None)) => true; case _ => false
    })

    val changes: DataFrame =
      if (canonicalUpsert || deleteOnly) {
        // 2-fast: op is decided without knowing matched-ness — no target read
        val action = matchedActions.head
        source.select(
          fields.map(f => valueFor(action, f).as(f.name)) :+
          lit(if (deleteOnly) "D" else "U").as("__op"): _*)
      } else {
        // 2. matched flag against the target's pruned distinct-key projection
        val cur = rel.pinnedVersion
        val pCols = VersionedTable.partColsOf(partitionCol)
        val partValues =
          if (pCols.forall(pc => source.columns.exists(resolver(_, pc))))
            Some(source
              .select(pCols.map(c => col(c).cast("string")): _*).distinct()
              .collect()
              .filterNot(r => pCols.indices.exists(r.isNullAt))
              .map(r => VersionedTable.partKeyOf(
                pCols, pCols.indices.map(r.getString)))
              .toSet)
          else None
        val targetKeys = VersionedTable
          .read(spark, path, cur, partValues, mergeSchema = true)
          .select(keyCols.map(col): _*).distinct()
          .withColumn("__m", lit(true))
        val flagged = source.join(targetKeys, keyCols, "left")
          .withColumn("__m", coalesce(col("__m"), lit(false)))
        // 3. first-matching-action-wins, matched actions before not-matched
        val gates: Seq[(MergeAction, org.apache.spark.sql.Column)] =
          matchedActions.map(a => a -> condOf(a)
            .map(c => col("__m") && PlanShim.column(c)).getOrElse(col("__m"))) ++
          notMatchedActions.map(a => a -> condOf(a)
            .map(c => !col("__m") && PlanShim.column(c)).getOrElse(!col("__m")))
        val branchCol = gates.zipWithIndex.reverse
          .foldLeft(lit(-1)) { case (els, ((_, g), i)) =>
            when(g, lit(i)).otherwise(els)
          }
        val withBranch = flagged.withColumn("__branch", branchCol)
          .filter(col("__branch") >= 0)
        val actions = gates.map(_._1)
        withBranch.select(
          fields.map { f =>
            actions.zipWithIndex.reverse.foldLeft(lit(null).cast(f.dataType)) {
              case (els, (a, i)) =>
                when(col("__branch") === i, valueFor(a, f)).otherwise(els)
            }.as(f.name)
          } :+
          actions.zipWithIndex.reverse.foldLeft(lit(null).cast("string")) {
            case (els, (a, i)) =>
              when(col("__branch") === i, lit(opOf(a))).otherwise(els)
          }.as("__op"): _*)
      }

    // 4. one versioned commit; intra-batch order is vacuous (key-unique).
    // The partition columns (possibly several — comma spec) drop out of
    // the key list: mergeDataflow adds them back as the partition half of
    // the row identity, and a duplicate would select the column twice.
    val partCols = VersionedTable.partColsOf(partitionCol)
    VersionedTable.mergeCommit(spark, path,
      changes.withColumn("__seq", lit(0L)),
      keyCols.filterNot(k => partCols.exists(resolver(k, _))), partitionCol,
      opCol = "__op", seqCol = "__seq", statsCol = statsCol,
      readVersion = rel.pinnedVersion)
    // the session catalog caches this LogicalRelation: re-pin so a
    // SELECT-after-MERGE in the same session reads the new version
    rel.refreshSnapshot()
    Nil
    } finally source.unpersist()
  }
}
