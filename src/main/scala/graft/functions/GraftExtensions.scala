package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * for SQL use (`SELECT canonicalize_url(url) ...`). Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("canonicalize_url"),
      new ExpressionInfo(classOf[CanonicalizeUrl].getName, "canonicalize_url"),
      (args: Seq[Expression]) => CanonicalizeUrl(args.head)))
    e.injectFunction((FunctionIdentifier("url_host"),
      new ExpressionInfo(classOf[UrlHost].getName, "url_host"),
      (args: Seq[Expression]) => UrlHost(args.head)))
    e.injectFunction((FunctionIdentifier("url_path"),
      new ExpressionInfo(classOf[UrlPath].getName, "url_path"),
      (args: Seq[Expression]) => UrlPath(args.head)))
    e.injectFunction((FunctionIdentifier("resolve_url"),
      new ExpressionInfo(classOf[ResolveUrl].getName, "resolve_url"),
      (args: Seq[Expression]) => ResolveUrl(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("robots_allows"),
      new ExpressionInfo(classOf[RobotsAllows].getName, "robots_allows"),
      (args: Seq[Expression]) => RobotsAllows(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("crawl_delay"),
      new ExpressionInfo(classOf[CrawlDelay].getName, "crawl_delay"),
      (args: Seq[Expression]) => CrawlDelay(args.head)))
    e.injectFunction((FunctionIdentifier("gzip_bytes"),
      new ExpressionInfo(classOf[GzipBytes].getName, "gzip_bytes"),
      (args: Seq[Expression]) => GzipBytes(args.head)))
    e.injectFunction((FunctionIdentifier("gunzip_bytes"),
      new ExpressionInfo(classOf[GunzipBytes].getName, "gunzip_bytes"),
      (args: Seq[Expression]) => GunzipBytes(args.head)))
  }
}
