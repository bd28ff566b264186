package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** One SURVEY.md §2 operator: (session, sf-dir) => lazy DataFrame. */
  type Q = (SparkSession, String) => DataFrame
}
