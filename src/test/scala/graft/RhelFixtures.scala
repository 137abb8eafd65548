package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared RHEL test dimension — ONE definition for the three suites
  * that must pin the SAME inputs (RhelSpec unit pins,
  * GoldenSnapshotSpec byte-goldens, QualityGateSpec labels): three
  * divergent copies would silently let the suites test different
  * envelope sets for the same provider. */
object RhelFixtures {

  /** CSAF FPI dimension: GA + EUS streams for the webkit multi-RHSA
    * case; RHSA-2024:0010/0011 intentionally absent (Hydra fallback). */
  def webkitFpis(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("RHSA-2024:0001", "CVE-2024-1111",
        "AppStream-9.5.0.Z.MAIN:webkit2gtk3-0:2.46.1-2.el9_5.x86_64",
        "cpe:/a:redhat:enterprise_linux:9::appstream", null, "webkit2gtk3",
        "0:2.46.1-2.el9_5"),
      ("RHSA-2024:0002", "CVE-2024-1111",
        "AppStream-9.4.0.Z.EUS:webkit2gtk3-0:2.44.3-2.el9_4.5.x86_64",
        "cpe:/a:redhat:enterprise_linux:9::appstream", null, "webkit2gtk3",
        "0:2.44.3-2.el9_4.5"),
      ("RHSA-2024:0003", "CVE-2024-1111",
        "AppStream-8.6.0.Z.EUS:webkit2gtk3-0:2.40.0-1.el8_6.x86_64",
        "cpe:/a:redhat:enterprise_linux:8::appstream", null, "webkit2gtk3",
        "0:2.40.0-1.el8_6")
    ).toDF("rhsa_id", "cve", "fpi", "plat_cpe", "module", "name", "version")
  }
}
