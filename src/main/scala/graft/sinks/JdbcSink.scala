package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.core.WeatherTransform

/** O14 — the reference's MySQL sink
  * (/root/reference/airflow/dags/weather_etl.py:138–194) as a Spark JDBC
  * writer. Connection parameters mirror the reference's env config
  * (README.md:73–78: MYSQL_HOST/DATABASE/USER/PASSWORD); the VARCHAR
  * timestamp columns (weather_etl.py:75–76) are produced by the same
  * sink-edge formatting as the batch path.
  *
  * MySQL itself is unreachable in this container (zero egress), but the
  * write path EXECUTES here: JdbcSinkSpec drives [[append]] through embedded
  * Derby (shipped with Spark) and reads the rows back, including the FLOAT
  * narrowing the reference's DDL applies server-side. The parquet sink
  * ([[graft.core.WeatherDedup]]) remains the engine-native path and carries
  * the correctness suite. The reference's CREATE USER / GRANT
  * (weather_etl.py:46–48) maps to these credentials.
  */
object JdbcSink {

  final case class Config(host: String, port: Int, database: String,
                          user: String, password: String, table: String) {
    def url: String = s"jdbc:mysql://$host:$port/$database"
    def options: Map[String, String] = Map(
      "url" -> url,
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "driver" -> "com.mysql.cj.jdbc.Driver")
  }

  def configFromEnv(env: Map[String, String] = sys.env): Config = {
    def need(k: String): String = env.getOrElse(k,
      throw new IllegalArgumentException(
        s"Les informations de configuration sont manquantes: $k"))
    Config(need("MYSQL_HOST"), env.getOrElse("MYSQL_PORT", "3306").toInt,
      need("MYSQL_DATABASE"), need("MYSQL_USER"), need("MYSQL_PASSWORD"),
      env.getOrElse("MYSQL_TABLE", "weather"))
  }

  /** Append landed-schema rows to MySQL with the reference's VARCHAR
    * timestamp formatting. Note the FLOAT narrowing the reference's DDL
    * applies (weather_etl.py:70,74) happens server-side on insert; the
    * engine keeps doubles (SURVEY.md §7 "type-coercion edges"). */
  def append(flat: DataFrame, cfg: Config): Unit = append(flat, cfg.options)

  /** The executable core: same sink-edge formatting, arbitrary JDBC
    * connection options — what lets an embedded-Derby spec execute the
    * exact write path the MySQL config drives in production. */
  def append(flat: DataFrame, options: Map[String, String]): Unit =
    WeatherTransform.formatForSink(flat)
      .write.format("jdbc").options(options)
      .mode(SaveMode.Append).save()
}
