package graft.lake

/** Lake directory layout. Mirrors the reference's storage design
  * (`/root/reference/serverless_datalake/serverless_datalake_stack.py:144`:
  * one object-store prefix per source) as Hive-style partition dirs,
  * which Catalyst prunes before listing at any scale.
  *
  *  - `bronze/` — raw ingested objects as arrived (gzip JSON), laid out
  *    `bronze/<source>/<object>`; the source is carried by the path,
  *    exactly like the reference's S3 key prefix.
  *  - `lake/` — canonical parquet, `partitionBy(source)`.
  *  - `catalog/` — the queryable metadata table (O6/O7/O11),
  *    `partitionBy(source)` so the replay range scan prunes to one
  *    partition like DynamoDB's partition-key equality.
  *  - `distribution/` — per-source fan-out area (the SNS-topic
  *    equivalent, `serverless_datalake_stack.py:233-248`); subscribers
  *    are just readers of `distribution/source=<s>/`.
  */
final case class Layout(root: String) {
  val bronzeDir: String = s"$root/bronze"
  val lakeDir: String = s"$root/lake"
  val catalogDir: String = s"$root/catalog"
  val distributionDir: String = s"$root/distribution"
  val checkpointDir: String = s"$root/_checkpoints"

  def bronzeSourceDir(source: String): String = s"$bronzeDir/$source"
}
