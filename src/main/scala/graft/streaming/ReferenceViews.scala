package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's continuous queries as [[ViewDef]]s over the CDC
  * pipeline — its two hard streaming shapes:
  *
  *  - `order_view` (flink-ddl.sql:179-190): two-sided changelog equi-join
  *    orders ⋈ users, upserted by order id. An update to EITHER side
  *    re-emits joined rows; a delete on either side retracts them.
  *  - `user_order_stats_view` (flink-ddl.sql:197-211, README.md:328-334):
  *    per (user, day) SUM/COUNT over non-closed orders WITH retraction
  *    ("要加入撤回功能", flink-ddl.sql:213) — a cancelled (status→closed)
  *    or deleted order must leave the aggregates; a group with no
  *    surviving rows must disappear from the sink.
  *
  * Both are maintained by affected-key recomputation against the
  * materialized state: every step is a declarative join/agg over
  * distributed frames — per-batch work is proportional to (batch keys ×
  * state lookup), never a full-state rescan of unaffected keys' OUTPUT,
  * and nothing collects to the driver.
  */
object ReferenceViews {

  /** Schemas here follow the reference's tables: orders(id, user_id,
    * amount, ctime, utime, status, channel), users(id, name, age, ctime,
    * utime) — README.md:33-70. */

  val orderView: ViewDef = ViewDef("order_view", (pre, post, batch, ctx) => {
    val orders = post("orders")
    val users = post("users")
    val ordersBatch = batch("orders")
    val usersBatch = batch("users")

    // affected order keys: orders touched directly ∪ current orders of
    // touched users (a user update re-emits all that user's joined rows)
    val touchedUsers = usersBatch.select(col("key").as("u_key")).distinct()
    val ordersOfTouchedUsers = orders
      .join(touchedUsers, orders("user_id") === touchedUsers("u_key"))
      .select(col("key"))
    val affected =
      ordersBatch.select("key").union(ordersOfTouchedUsers).distinct()

    // recompute the joined document for affected orders from current state
    val o = orders.join(affected, Seq("key"), "left_semi")
    val joined = o.join(users, o("user_id") === users("id"))
      .select(
        o("key").as("id"),
        o("amount").as("order.amount"),
        o("status").as("order.status"),
        o("channel").as("order.channel"),
        users("name").as("user.name"),
        users("age").as("user.age"),
        o("ctime").as("ctime"),
        o("utime").as("utime"))

    // anything affected that no longer joins (order deleted, user deleted)
    // is retracted from the sink
    val deletes = affected.select(col("key").as("id"))
      .except(joined.select("id"))
    (joined, deletes)
  })

  /** Group id for the stats view: user + day. The reference sinks these
    * with doc id = user_id only (flink-ddl.sql:158-166) which makes
    * different days of one user collide in the index; we key by
    * (user, day) so every group is individually addressable — same
    * aggregates, well-defined identity. */
  private def dayGroups(df: DataFrame): DataFrame =
    df.select(
      col("user_id").cast("string").as("g_user"),
      date_format(col("ctime"), "yyyy-MM-dd").as("g_day"))

  val userOrderStats: ViewDef = ViewDef("user_order_stats_view", (pre, post, batch, ctx) => {
    val ordersBatch = batch("orders")

    // groups possibly affected by this batch: the groups of PRE-state rows
    // for touched keys (where a row is LEAVING: delete, day move, cancel)
    // plus the groups of every batch image (before AND after)
    val touched = ordersBatch.select("key").distinct()
    val oldGroups = dayGroups(
      pre("orders").join(touched, Seq("key"), "left_semi"))
    val imgGroups = ordersBatch
      .select(explode(array(col("before"), col("after"))).as("img"))
      .filter(col("img").isNotNull)
      .select(col("img.user_id").cast("string").as("g_user"),
        date_format(col("img.ctime"), "yyyy-MM-dd").as("g_day"))
    val affected = oldGroups.union(imgGroups).distinct()
      .filter(col("g_user").isNotNull && col("g_day").isNotNull)

    // recompute affected groups from current state — the WHERE <> 'closed'
    // filter is what turns a cancellation into a retraction
    // (flink-ddl.sql:208)
    val live = post("orders").filter(col("status") =!= "closed")
    val grouped = live
      .withColumn("g_user", col("user_id").cast("string"))
      .withColumn("g_day", date_format(col("ctime"), "yyyy-MM-dd"))
      .join(affected, Seq("g_user", "g_day"), "left_semi")
      .groupBy("g_user", "g_day")
      .agg(sum("amount").as("order.amount.day"),
        count(lit(1)).as("order.count.day"))
      .select(
        concat_ws("|", col("g_user"), col("g_day")).as("id"),
        col("g_user").as("user_id"), col("g_day").as("cday"),
        col("`order.amount.day`"), col("`order.count.day`"))

    // affected groups with no surviving rows vanish from the sink
    val deletes = affected
      .select(concat_ws("|", col("g_user"), col("g_day")).as("id"))
      .except(grouped.select("id"))
    (grouped, deletes)
  })

  /** Q1 `user_view` pass-through (flink-ddl.sql:192 `INSERT INTO
    * user_view SELECT id, name, age, ctime, utime FROM users`): every user
    * change streams into the shared `user_view` index. */
  val userView: ViewDef = ViewDef("user_view", (pre, post, batch, ctx) => {
    val touched = batch("users").select("key").distinct()
    val rows = post("users").join(touched, Seq("key"), "left_semi")
      .select(col("id"), col("name"), col("age"), col("ctime"), col("utime"))
    val deletes = touched.select(col("key").as("id")).except(rows.select("id"))
    (rows, deletes)
  }, index = "user_view")

  /** Cumulative per-user order totals, sunk into the SAME `user_view`
    * index — the reference's shared-index pattern (flink-ddl.sql:143,165:
    * two continuous queries merging fields into one ES document per
    * user). Keyed by user id, so the sink partial-merges these fields
    * into the passthrough user document. */
  val userTotals: ViewDef = ViewDef("user_totals", (pre, post, batch, ctx) => {
    val ordersBatch = batch("orders")
    val touchedUsers = ordersBatch
      .select(explode(array(col("before.user_id"), col("after.user_id")))
        .as("uid"))
      .union(pre("orders").join(ordersBatch.select("key").distinct(),
        Seq("key"), "left_semi").select(col("user_id").as("uid")))
      .filter(col("uid").isNotNull).distinct()
    val live = post("orders").filter(col("status") =!= "closed")
    val grouped = live
      .join(touchedUsers, live("user_id") === col("uid"), "left_semi")
      .groupBy("user_id")
      .agg(sum("amount").as("order.amount.total"),
        count(lit(1)).as("order.count.total"))
      .select(col("user_id").as("id"),
        col("`order.amount.total`"), col("`order.count.total`"))
    val deletes = touchedUsers.select(col("uid").as("id"))
      .except(grouped.select("id"))
    (grouped, deletes)
  }, index = "user_view")

  /** `product_view` pass-through (flink-ddl.sql:194 `INSERT INTO
    * product_view SELECT id, name, price, ctime, utime FROM products`). */
  val productView: ViewDef = ViewDef("product_view", (pre, post, batch, ctx) => {
    val touched = batch("products").select("key").distinct()
    val rows = post("products").join(touched, Seq("key"), "left_semi")
      .select(col("id"), col("name"), col("price"), col("ctime"),
        col("utime"))
    val deletes = touched.select(col("key").as("id")).except(rows.select("id"))
    (rows, deletes)
  })

  /** `order_stats_view` (flink-ddl.sql:214-227): per-DAY order amount and
    * count over non-closed orders, with the same retraction contract as
    * the per-user variant ("要加入撤回功能" applies to both,
    * flink-ddl.sql:213). Doc id = cday, matching the reference's
    * `cday id` projection. */
  val orderStats: ViewDef = ViewDef("order_stats_view", (pre, post, batch, ctx) => {
    val ordersBatch = batch("orders")
    val touched = ordersBatch.select("key").distinct()
    val days = (df: DataFrame) =>
      df.select(date_format(col("ctime"), "yyyy-MM-dd").as("g_day"))
    val affected = days(pre("orders").join(touched, Seq("key"), "left_semi"))
      .union(ordersBatch
        .select(explode(array(col("before.ctime"), col("after.ctime")))
          .as("ctime"))
        .filter(col("ctime").isNotNull)
        .select(date_format(col("ctime"), "yyyy-MM-dd").as("g_day")))
      .filter(col("g_day").isNotNull).distinct()

    val live = post("orders").filter(col("status") =!= "closed")
    val grouped = live
      .withColumn("g_day", date_format(col("ctime"), "yyyy-MM-dd"))
      .join(affected, Seq("g_day"), "left_semi")
      .groupBy("g_day")
      .agg(sum("amount").as("amount"), count(lit(1)).as("cnt"))
      .select(col("g_day").as("id"), col("amount"), col("cnt"))

    val deletes = affected.select(col("g_day").as("id"))
      .except(grouped.select("id"))
    (grouped, deletes)
  })

  /** `order_view_items` (flink-ddl.sql:111-132): the continuous
    * LISTAGG/COLLECT(ROW(...)) forms — per-order item CSV and nested
    * ARRAY<ROW> document, upserted INTO THE SHARED `order_view` index so
    * the item list merges into the joined order document. Per-batch
    * recompute of affected orders is retraction-equivalent for both
    * aggregates (SURVEY §2.2 Q10/Q11 notes). */
  val orderItemsView: ViewDef = ViewDef("order_view_items", (pre, post, batch, ctx) => {
    val itemsBatch = batch("order_items")
    val touchedItems = itemsBatch.select("key").distinct()
    val affectedOrders = itemsBatch
      .select(explode(array(col("before.order_id"), col("after.order_id")))
        .as("order_id"))
      .union(pre("order_items")
        .join(touchedItems, Seq("key"), "left_semi").select("order_id"))
      .filter(col("order_id").isNotNull).distinct()

    val items = post("order_items")
      .join(affectedOrders, Seq("order_id"), "left_semi")
    val docs = items.groupBy("order_id")
      .agg(
        array_join(array_sort(collect_list(col("product_id").cast("string"))),
          ",").as("order.item_csv"),
        array_sort(collect_list(struct(
          col("product_id").as("product.id"), col("price"),
          col("quantity")))).as("order.items"))
      .select(col("order_id").as("id"),
        col("`order.item_csv`"), col("`order.items`"))

    val deletes = affectedOrders.select(col("order_id").as("id"))
      .except(docs.select("id"))
    (docs, deletes)
  }, index = "order_view")

  /** `product_stats_view` (flink-ddl.sql:243-259): order_items ⋈ orders
    * with the non-closed filter, cumulative per-product count(*) and
    * SUM(amount) — the fact-to-fact join + retractive agg combined. The
    * reference's inner salt bucket is result-invisible (absent from the
    * outer SELECT) and intentionally dropped (SURVEY §4). Affected
    * products come from item images, pre-state rows of touched items, and
    * items of touched ORDERS (a status flip retracts every item of that
    * order). */
  val productStats: ViewDef = ViewDef("product_stats_view", (pre, post, batch, ctx) => {
    val itemsBatch = batch("order_items")
    val ordersBatch = batch("orders")

    val touchedItems = itemsBatch.select("key").distinct()
    val imgProducts = itemsBatch
      .select(explode(array(col("before"), col("after"))).as("img"))
      .filter(col("img").isNotNull)
      .select(col("img.product_id").as("product_id"))
    val preItemProducts = pre("order_items")
      .join(touchedItems, Seq("key"), "left_semi").select("product_id")
    val touchedOrders = ordersBatch.select(col("key").as("o_key")).distinct()
    def productsOfTouchedOrders(items: DataFrame) = items
      .join(touchedOrders, items("order_id") === col("o_key"))
      .select("product_id")
    val affected = imgProducts
      .union(preItemProducts)
      .union(productsOfTouchedOrders(pre("order_items")))
      .union(productsOfTouchedOrders(post("order_items")))
      .distinct().filter(col("product_id").isNotNull)

    val liveOrders = post("orders").filter(col("status") =!= "closed")
      .select(col("key").as("live_order"))
    val items = post("order_items")
      .join(affected, Seq("product_id"), "left_semi")
    val grouped = items
      .join(liveOrders, items("order_id") === col("live_order"))
      .groupBy("product_id")
      .agg(count(lit(1)).as("quantity"), sum("amount").as("amount"))
      .select(col("product_id").as("id"), col("quantity"), col("amount"))

    val deletes = affected.select(col("product_id").as("id"))
      .except(grouped.select("id"))
    (grouped, deletes)
  })
}
