package graft.report

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class ChartsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def decode(bytes: Array[Byte]) =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def countColor(img: java.awt.image.BufferedImage, c: java.awt.Color): Int = {
    val rgb = c.getRGB
    (0 until img.getHeight).map(y =>
      (0 until img.getWidth).count(x => img.getRGB(x, y) == rgb)).sum
  }

  test("hBarChart: diverging colors, proportional bars, white canvas") {
    val bytes = Charts.hBarChart(
      Seq("openai", "google", "anthropic"), Seq(3.0, -2.0, 1.0), "impact")
    val img = decode(bytes)
    img.getWidth shouldBe 880
    img.getHeight shouldBe 480
    img.getRGB(2, 2) shouldBe java.awt.Color.WHITE.getRGB
    val red = countColor(img, Charts.Red) // positive bars
    val blue = countColor(img, Charts.Blue) // negative bars
    red should be > 0
    blue should be > 0
    // positive mass 3+1 = 2× the negative mass 2 — allow antialias slack
    red.toDouble / blue should (be > 1.5 and be < 2.5)
  }

  test("hBarChart: canvas grows with the label count — every row keeps a " +
    "visible stride (no rowH=0 overdraw past ~360 labels)") {
    val n = 500
    val labels = (1 to n).map(i => s"label_$i")
    val values = (1 to n).map(_.toDouble)
    val img = decode(Charts.hBarChart(labels, values, "many rows"))
    img.getHeight should be >= n * 12 // one ≥12px row per label
    // top and bottom rows both land on canvas: red bar pixels exist in
    // the first and last row bands (overdraw would stack them all at top)
    def bandHasRed(y0: Int, y1: Int): Boolean =
      (y0 until y1).exists(y => (0 until img.getWidth)
        .exists(x => img.getRGB(x, y) == Charts.Red.getRGB))
    bandHasRed(30, 90) shouldBe true // first row lands just under Margin=60
    bandHasRed(img.getHeight - 90, img.getHeight - 30) shouldBe true
  }

  test("F17 label truncation: >15-char labels cut to 15 + '..', short ones " +
    "untouched; rendered chrome ink stays bounded for absurd labels") {
    Charts.truncateLabel("short") shouldBe "short"
    Charts.truncateLabel("exactly15chars!") shouldBe "exactly15chars!"
    Charts.truncateLabel("a-very-long-entity-name.example.com") shouldBe
      "a-very-long-ent.."
    // render-side proof: a chart with a 200-char label draws no more
    // label ink than one with the 17-char truncation of it (identical
    // pixels — truncation happens at the drawString site)
    val long = "x" * 200
    val a = Charts.hBarChart(Seq(long), Seq(1.0), "t")
    val b = Charts.hBarChart(Seq(Charts.truncateLabel(long)), Seq(1.0), "t")
    a.toSeq shouldBe b.toSeq
  }

  test("groupedBarChart: one color per series, taller value → more pixels") {
    val bytes = Charts.groupedBarChart(
      Seq("feb", "may"),
      Seq("Google" -> Seq(4.0, 1.0), "OpenAI" -> Seq(1.0, 4.0)), "share")
    val img = decode(bytes)
    countColor(img, Charts.Blue) should be > 0 // series 0
    countColor(img, Charts.Red) should be > 0 // series 1
    // both series plot 4.0+1.0 — masses within antialias slack of equal
    val ratio = countColor(img, Charts.Blue).toDouble / countColor(img, Charts.Red)
    ratio should (be > 0.9 and be < 1.1)
  }

  test("DataFrame sinks write decodable PNGs from an aggregated result") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_charts_").toString
    val agg = Seq(("openai", 2.16, 1.19), ("google", 1.9, 2.3))
      .toDF("brand", "pct_may", "pct_feb")
    Charts.writeHBarChartPng(agg, "brand", "pct_may", "t", s"$dir/h.png")
    Charts.writeGroupedBarChartPng(agg, "brand", Seq("pct_feb", "pct_may"),
      "t", s"$dir/g.png")
    val h = ImageIO.read(new java.io.File(s"$dir/h.png"))
    val g = ImageIO.read(new java.io.File(s"$dir/g.png"))
    h.getWidth shouldBe 880
    g.getWidth shouldBe 800
  }

  test("invalid inputs fail fast") {
    an[IllegalArgumentException] should be thrownBy
      Charts.hBarChart(Seq("a"), Seq(1.0, 2.0), "t")
    an[IllegalArgumentException] should be thrownBy
      Charts.groupedBarChart(Seq("a"), Seq("s" -> Seq(1.0, 2.0)), "t")
  }
}
