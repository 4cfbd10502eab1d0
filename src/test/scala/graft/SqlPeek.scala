package graft
object SqlPeek {
  def main(args: Array[String]): Unit =
    args.foreach(q => println("-----8<-----\n" +
      SparkEntry.oracleSql(q) + "\n----->8-----"))
}
