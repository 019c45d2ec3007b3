package graft.ops

import org.apache.spark.fs.{Path => _} // (no such pkg — placeholder guard, removed below)
