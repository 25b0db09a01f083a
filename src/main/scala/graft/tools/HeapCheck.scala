package graft.tools
object HeapCheck {
  def main(args: Array[String]): Unit =
    println(s"[heap] maxMemory=${Runtime.getRuntime.maxMemory() / (1024*1024*1024.0)} GiB")
}
