package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LangModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Real-language training sentences — the char-bigram statistics the
    * model must learn (articles, diacritics, CJK codepoints). */
  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog in the garden", "en"),
    (2L, "she was reading a book while the rain fell outside the window", "en"),
    (3L, "they walked through the old town and talked about the weather", "en"),
    (4L, "der hund und die katze spielen zusammen im garten hinter dem haus", "de"),
    (5L, "ich habe gestern ein interessantes buch über die geschichte gelesen", "de"),
    (6L, "das wetter ist heute schön und wir gehen in den wald spazieren", "de"),
    (16L, "die kinder kaufen frisches obst und gemüse auf dem wochenmarkt", "de"),
    (17L, "der bäcker verkauft jeden morgen frische brötchen und kuchen", "de"),
    (7L, "el perro corre por el parque mientras los niños juegan a la pelota", "es"),
    (8L, "la casa tiene una ventana grande que mira hacia las montañas", "es"),
    (9L, "ayer fuimos al mercado para comprar frutas y verduras frescas", "es"),
    (18L, "los estudiantes estudian español en la universidad cada mañana", "es"),
    (19L, "el maestro explica la lección a los alumnos en la escuela", "es"),
    (10L, "le chien court dans le jardin pendant que les enfants jouent", "fr"),
    (11L, "nous avons mangé du pain avec du fromage et bu du vin rouge", "fr"),
    (12L, "elle regarde par la fenêtre et pense à son prochain voyage", "fr"),
    (20L, "le garçon achète une baguette fraîche chez le boulanger du quartier", "fr"),
    (21L, "ils visitent souvent les musées et les cafés de la ville", "fr"),
    (13L, "我 的 朋友 在 北京 工作 他 每天 都 很 忙", "zh"),
    (14L, "今天 天气 很 好 我们 去 公园 散步 吧", "zh"),
    (15L, "他 喜欢 读书 也 喜欢 听 音乐 和 看 电影", "zh"),
  )

  private val held = Seq(
    (101L, "the children played in the park until the sun went down", "en"),
    (102L, "die frau kauft frisches brot und käse auf dem markt", "de"),
    (103L, "los estudiantes leen muchos libros en la biblioteca", "es"),
    (104L, "le professeur explique la leçon aux étudiants dans la salle", "fr"),
    (105L, "她 在 学校 学习 中文 和 数学", "zh"),
  )

  test("classifies held-out real-language prose correctly") {
    val docs = train.toDF("doc_id", "text", "lang")
    val model = LangModel.train(docs, "text", "lang", 256)
    val priors = LangModel.priors(docs, "lang")
    val test = held.toDF("doc_id", "text", "expected")
    val got = test
      .join(LangModel.classify(test, model, priors, "text", "doc_id", 256)
        .withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .select($"expected", $"lang_pred").as[(String, String)].collect()
    got.foreach { case (exp, pred) =>
      assert(pred == exp, s"expected $exp got $pred")
    }
  }

  test("no-evidence docs predict 'und' with a null score (total policy)") {
    val docs = (train.map { case (i, t, l) => (i, t, l) } ++
      Seq((200L, null: String, null: String), (201L, "x", null: String)))
      .toDF("doc_id", "text", "lang")
    val out = LangModel.selfClassify(docs, "text", "lang", "doc_id", 256)
      .as[(Long, String, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(out(200L)._2 == "und" && out(200L)._3.isEmpty)
    assert(out(201L)._2 == "und" && out(201L)._3.isEmpty,
      "a 1-char text has no bigram and carries no evidence")
    assert(out.size == train.size + 2, "classification is total over ids")
  }

  test("model and prior tables are bounded by langs x buckets (broadcastable)") {
    val docs = train.toDF("doc_id", "text", "lang")
    val model = LangModel.train(docs, "text", "lang", 64)
    assert(model.count() == 5L * 64, "full lang x bucket spine")
    assert(LangModel.priors(docs, "lang").count() == 5)
    // Unseen buckets carry the smoothed floor, not null.
    assert(model.filter($"logp".isNull).count() == 0)
  }

  test("training excludes unlabeled rows but classification covers them") {
    val docs = (train :+ ((300L, "completely unlabeled text here", null: String)))
      .toDF("doc_id", "text", "lang")
    val model = LangModel.train(docs, "text", "lang", 64)
    assert(model.select($"lang").distinct().count() == 5)
    val out = LangModel.selfClassify(docs, "text", "lang", "doc_id", 64)
    assert(out.filter($"id" === 300L).count() == 1)
  }
}
