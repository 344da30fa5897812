package graft.etl

import org.apache.spark.sql.types._

/** The reference's explicit 29-column flight-fact schema
  * (notebook.py:90–120) — explicit rather than inferred, deliberately
  * (schema inference = an extra full scan; at 100 TB it is a non-starter).
  * `TailNum` is declared IntegerType exactly as the reference does even
  * though real tail numbers are alphanumeric: under PERMISSIVE CSV
  * parsing every value becomes null and the completeness rule then drops
  * the column — reproducing that behavior is part of parity (SURVEY §1.3).
  */
object FlightSchema {

  val intCols: Seq[String] = Seq(
    "Year", "Month", "DayofMonth", "DayOfWeek", "DepTime", "CRSDepTime",
    "ArrTime", "CRSArrTime", "FlightNum", "TailNum", "ActualElapsedTime",
    "CRSElapsedTime", "AirTime", "ArrDelay", "DepDelay", "Distance",
    "TaxiIn", "TaxiOut", "Cancelled", "Diverted", "CarrierDelay",
    "WeatherDelay", "NASDelay", "SecurityDelay", "LateAircraftDelay")

  val stringCols: Seq[String] = Seq("UniqueCarrier", "Origin", "Dest", "CancellationCode")

  /** Column order as in the raw CSV (notebook.py:90–120). */
  val schema: StructType = StructType(Seq(
    "Year", "Month", "DayofMonth", "DayOfWeek", "DepTime", "CRSDepTime",
    "ArrTime", "CRSArrTime", "UniqueCarrier", "FlightNum", "TailNum",
    "ActualElapsedTime", "CRSElapsedTime", "AirTime", "ArrDelay",
    "DepDelay", "Origin", "Dest", "Distance", "TaxiIn", "TaxiOut",
    "Cancelled", "CancellationCode", "Diverted", "CarrierDelay",
    "WeatherDelay", "NASDelay", "SecurityDelay", "LateAircraftDelay"
  ).map(c => StructField(c, if (stringCols.contains(c)) StringType else IntegerType, nullable = true)))
}
