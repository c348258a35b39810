package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** E3/E4/U1/U2 — feed-list wire format round trip. */
class FeedListSpec extends SparkSpec {
  import spark.implicits._

  test("read drops the header pair and write round-trips") {
    val dir = Files.createTempDirectory("feedlist").toString
    val path = s"$dir/feeds.json"
    val df = Seq(
      ("pod-a", "https://a.example/feed"),
      ("pod-b", "https://b.example/rss"))
      .toDF("podcast_name", "rss_feed")
    FeedList.write(df, path)
    val raw = Files.readString(java.nio.file.Paths.get(path))
    assert(raw.startsWith("""[["podcast_name","rss_feed"]""")) // header first
    val back = FeedList.read(spark, path)
      .orderBy("podcast_name").collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("pod-a", "https://a.example/feed"),
      ("pod-b", "https://b.example/rss")))
  }

  test("quotes and control chars in names survive the wire format") {
    val dir = Files.createTempDirectory("feedlist").toString
    val path = s"$dir/feeds.json"
    val tricky = Seq(
      ("""say "hi"\now""", "https://q.example/feed"),
      ("tab\there", "https://t.example/rss"),
      ("podcast_name", "https://literal-header-name.example/rss"))
      .toDF("podcast_name", "rss_feed")
    FeedList.write(tricky, path)
    val back = FeedList.read(spark, path).orderBy("rss_feed").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(back == Seq(
      ("podcast_name", "https://literal-header-name.example/rss"),
      ("""say "hi"\now""", "https://q.example/feed"),
      ("tab\there", "https://t.example/rss")))
  }

  test("static feeds union ahead of scraped, dedup on feed url (U1)") {
    val static = Seq(("hard", "https://x/feed")).toDF("podcast_name", "rss_feed")
    val scraped = Seq(
      ("scraped-dup", "https://x/feed"),
      ("scraped-new", "https://y/rss")).toDF("podcast_name", "rss_feed")
    val out = FeedList.withStaticFeeds(scraped, static)
      .orderBy("rss_feed").collect()
    assert(out.length == 2)
    assert(out.head.getString(0) == "hard") // static wins on the dup URL
  }
}
