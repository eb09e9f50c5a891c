package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._
import graft.operators.StateStore

/** ScalaCheck properties for incremental state (SURVEY §5.3): change
  * detection must be idempotent (a second run over unchanged input yields an
  * empty work set) and upsert must be latest-wins. Few cases — each property
  * evaluation runs real Spark jobs.
  */
object StateProps extends Properties("StateStore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestBase.spark
  import scala.jdk.CollectionConverters._

  private def stateDf(rows: Seq[(String, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      rows.map { case (id, fp) => Row(id, fp, null) }.asJava,
      StateStore.schema)
  }

  private val items: Gen[List[(String, String)]] =
    Gen.choose(0, 20).flatMap(n => Gen.listOfN(n,
      for {
        id <- Gen.choose(0, 30).map(i => s"item_$i")
        fp <- Gen.choose(0, 5).map(f => s"fp_$f")
      } yield (id, fp))).map(_.distinctBy(_._1))

  property("second run over unchanged input is an empty work set (idempotence)") =
    forAll(items) { rows =>
      val incoming = stateDf(rows)
        .select(col("item_id"), col("fingerprint"))
      val state0 = stateDf(Nil)
      val firstRun = StateStore.changed(incoming, state0)
      val state1 = StateStore.upsert(state0, firstRun)
      firstRun.count() == rows.length &&
        StateStore.changed(incoming, state1).isEmpty
    }

  property("upsert is latest-wins per item and loses nothing") =
    forAll(items, items) { (oldRows, newRows) =>
      val merged = StateStore.upsert(stateDf(oldRows),
          stateDf(newRows).select(col("item_id"), col("fingerprint")))
        .select("item_id", "fingerprint").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val expected = oldRows.toMap ++ newRows.toMap
      merged == expected
    }

  property("changed = exactly the rows whose fingerprint differs or id is unseen") =
    forAll(items, items) { (stateRows, incomingRows) =>
      val got = StateStore.changed(
          stateDf(incomingRows).select(col("item_id"), col("fingerprint")),
          stateDf(stateRows))
        .select("item_id").collect().map(_.getString(0)).toSet
      val st = stateRows.toMap
      val expected = incomingRows.filter { case (id, fp) => !st.get(id).contains(fp) }
        .map(_._1).toSet
      got == expected
    }
}
