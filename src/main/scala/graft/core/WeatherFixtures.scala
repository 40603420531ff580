package graft.core

/** Canonical raw-document fixtures (FIXTURES.md §1) — the shapes the reference
  * actually processes, used by the fixture-driven driver queries and specs.
  * Values chosen so every expected output is hand-checkable:
  * 1723456800 = 2024-08-12 10:00:00 UTC.
  */
object WeatherFixtures {

  /** README.md:70–72 config: Marseille, lang=fr, units=metric; +7200s offset. */
  val marseille: String =
    """{"name":"Marseille","dt":1723456800,"timezone":7200,
      |"main":{"temp":27.3,"humidity":48,"pressure":1015},
      |"weather":[{"id":800,"main":"Clear","description":"ciel dégagé","icon":"01d"}],
      |"wind":{"speed":4.6}}""".stripMargin.replace("\n", "")

  /** Negative UTC offset (offset addition, not tz conversion —
    * weather_etl.py:120). -14400s = UTC-4. */
  val montreal: String =
    """{"name":"Montreal","dt":1723456800,"timezone":-14400,
      |"main":{"temp":22.1,"humidity":61,"pressure":1008},
      |"weather":[{"id":500,"main":"Rain","description":"légère pluie","icon":"10d"}],
      |"wind":{"speed":7.2}}""".stripMargin.replace("\n", "")

  /** Same city as marseille, later observation → distinct (city, utc) key. */
  val marseilleLater: String =
    """{"name":"Marseille","dt":1723456920,"timezone":7200,
      |"main":{"temp":27.5,"humidity":47,"pressure":1015},
      |"weather":[{"id":800,"main":"Clear","description":"ciel dégagé","icon":"01d"}],
      |"wind":{"speed":4.8}}""".stripMargin.replace("\n", "")

  /** Empty weather array — the reference would KeyError (weather_etl.py:125);
    * strict mode reproduces the failure, permissive yields NULL. */
  val emptyWeather: String =
    """{"name":"Nulle-Part","dt":1723456800,"timezone":0,
      |"main":{"temp":0.0,"humidity":0,"pressure":1000},
      |"weather":[],"wind":{"speed":0.0}}""".stripMargin.replace("\n", "")

  val all: Seq[String] = Seq(marseille, montreal, marseilleLater)
}
