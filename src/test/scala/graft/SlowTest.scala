package graft

/** Tag for measurement-grade scale tests (codec batteries, convergence /
  * cache-scale measurements): excluded from plain `sbt test` so the suite
  * fits the external verification budget (r19 verdict item 2); run them
  * explicitly with `sbt "testOnly * -- -n graft.SlowTest"`. */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
