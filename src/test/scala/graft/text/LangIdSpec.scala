package graft.text

import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {
  import LangId.langId

  test("identifies real-language samples") {
    assert(langId("The quick brown fox jumps over the lazy dog and it runs") == "en")
    assert(langId("El rápido zorro marrón salta sobre el perro perezoso y se va") == "es")
    assert(langId("Der schnelle braune Fuchs springt über den faulen Hund und die Katze") == "de")
    assert(langId("Le renard brun rapide saute par-dessus le chien paresseux dans la forêt") == "fr")
    assert(langId("敏捷的棕色狐狸跳过了懒惰的狗") == "zh")
  }

  test("mixed CJK/latin goes CJK when CJK dominates") {
    assert(langId("这是一个 test 的文档 有很多中文字符在里面") == "zh")
  }

  test("no signal yields und") {
    assert(langId("") == "und")
    assert(langId("   ") == "und")
    assert(langId("zzz qqq xxx www") == "und")
    assert(langId("12345 67890") == "und")
  }

  test("deterministic on repeated calls and case-insensitive") {
    val s = "The Cat AND THE Dog are IN the House"
    assert(langId(s) == langId(s.toLowerCase))
    assert(langId(s) == "en")
  }

  test("column form works in a projection") {
    import graft.TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("the cat and the dog is here",
      "el perro y la casa que se ve").toDF("text")
      .select(LangId.langIdCol(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es"))
  }
}
