package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the metadata algebra (SURVEY.md §5.2 item 3).
  * Plan-only properties — no Spark jobs run, so many cases are cheap. */
object MetadataLawsSpec extends Properties("MetadataLaws") {

  private lazy val spark = TestSparkSession.spark

  private lazy val base: DataFrame = {
    import spark.implicits._
    Seq(("a", 1L, "x"), ("b", 2L, "y"), ("c", 3L, "x")).toDF("k1", "v", "k2")
  }

  private val metaGen: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(Gen.identifier, Gen.oneOf[Any](Gen.alphaStr, Gen.long, Gen.posNum[Int])))

  private val keysGen: Gen[Seq[String]] =
    Gen.atLeastOne(Seq("k1", "v", "k2")).map(_.toSeq)

  property("setMetadata is right-biased map union") =
    Prop.forAll(metaGen, metaGen) { (m1, m2) =>
      MetaFrame(base, m1).setMetadata(m2.toSeq: _*).metadata == m1 ++ m2
    }

  property("groupBy(ks).agg.primaryKey == Some(ks); other metadata survives") =
    Prop.forAll(keysGen, metaGen) { (ks, m) =>
      val out = MetaFrame(base, m).groupBy(ks.head, ks.tail: _*).agg(Map("v" -> "max"))
      out.primaryKey.contains(ks) &&
        (m - MetaFrame.PrimaryKeyField).forall { case (k, v) => out.metadata.get(k).contains(v) }
    }

  property("dropDuplicates(ks).primaryKey == Some(ks)") =
    Prop.forAll(keysGen) { ks =>
      MetaFrame(base, Map.empty).dropDuplicates(ks).primaryKey.contains(ks)
    }

  property("child transformations never mutate the parent's metadata") =
    Prop.forAll(metaGen) { m =>
      val parent = MetaFrame(base, m)
      parent.setMetadata("mutant" -> 1)
      parent.groupBy("k1").count()
      parent.distinct()
      parent.metadata == m
    }

  property("wrap-closure: forwarders carry metadata unchanged") =
    Prop.forAll(metaGen) { m =>
      val mf = MetaFrame(base, m)
      mf.select("k1").metadata == m &&
        mf.filter(col("v") > 0).metadata == m &&
        mf.withColumn("w", lit(1)).metadata == m &&
        mf.orderBy("k1").metadata == m &&
        mf.limit(1).metadata == m
    }
}
