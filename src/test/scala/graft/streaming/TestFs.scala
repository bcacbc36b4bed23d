package graft.streaming

/** A Hadoop `FileSystem` registered under the NON-`file:` scheme
  * `testfs:` (backed by the local disk via `RawLocalFileSystem`) — the
  * deployment-portability probe for state layers: any code that
  * resolves a `testfs:/...` state path with `java.io.File` sees
  * nothing (the r12 X97 defect), while code routed through the Hadoop
  * [[org.apache.hadoop.fs.FileSystem]] API works unchanged. Registered
  * per-test via `fs.testfs.impl` on the session's Hadoop conf.
  */
class TestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "testfs"
  override def getUri: java.net.URI = java.net.URI.create("testfs:///")
}
