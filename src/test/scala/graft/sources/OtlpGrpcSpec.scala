package graft.sources

import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, MultiThreadIoEventLoopGroup, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._

import graft.SparkSpec

/** Live gRPC-over-h2c test: a real HTTP/2 client connection (Netty's h2
  * client codec — full HPACK + framing, prior knowledge like stock
  * insecure `otlp` exporters) carrying length-prefixed gRPC messages into
  * [[OtlpGrpcServer]], asserting both the gRPC status machine and that the
  * payload lands flattened in the spool. */
class OtlpGrpcSpec extends SparkSpec {

  // --- minimal protobuf writer (same approach as OtlpProtoSpec) ---
  private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v = v >>> 7 }
    out.write(v.toInt)
  }
  private def ld(field: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    varint(out, (field.toLong << 3) | 2); varint(out, payload.length)
    out.write(payload); out.toByteArray
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write); out.toByteArray
  }
  private def str(field: Int, s: String) = ld(field, s.getBytes("UTF-8"))
  private def f64(field: Int, v: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    varint(out, (field.toLong << 3) | 1)
    (0 until 8).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt))
    out.toByteArray
  }

  /** ExportLogsServiceRequest: one timestamped record, body "grpc works". */
  private def logsRequest: Array[Byte] = {
    val record = cat(
      f64(1, 1735725600000000000L), // timeUnixNano
      str(3, "INFO"), // severityText
      ld(5, str(1, "grpc works"))) // body.stringValue
    val resource = ld(1, ld(1, cat(str(1, "service"), ld(2, str(1, "api")))))
    ld(1, cat( // resourceLogs
      resource,
      ld(2, cat( // scopeLogs
        ld(1, str(1, "grpclogger")), // scope.name
        ld(2, record)))))
  }

  /** 1-byte flag + 4-byte BE length + protobuf payload. */
  private def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(msg.length).array())
    out.write(msg); out.toByteArray
  }

  private final case class GrpcReply(grpcStatus: Int, dataBytes: Int)

  /** POST one unary gRPC call over a fresh prior-knowledge h2c connection. */
  private def call(port: Int, path: String, body: Array[Byte],
                   extraHeaders: Map[String, String] = Map.empty): GrpcReply = {
    val group = new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())
    try {
      val reply = new CompletableFuture[GrpcReply]()
      val conn = new Bootstrap()
        .group(group)
        .channel(classOf[NioSocketChannel])
        .handler(new ChannelInitializer[SocketChannel] {
          def initChannel(ch: SocketChannel): Unit =
            ch.pipeline.addLast(
              Http2FrameCodecBuilder.forClient().build(),
              new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
        })
        .connect("127.0.0.1", port).sync().channel()
      val stream = new Http2StreamChannelBootstrap(conn)
        .handler(new ChannelInitializer[Channel] {
          def initChannel(ch: Channel): Unit =
            ch.pipeline.addLast(new SimpleChannelInboundHandler[Http2StreamFrame] {
              private var status = -1
              private var bytes = 0
              def channelRead0(ctx: ChannelHandlerContext, f: Http2StreamFrame): Unit =
                f match {
                  case h: Http2HeadersFrame =>
                    val s = h.headers.get("grpc-status")
                    if (s != null) status = String.valueOf(s).toInt
                    if (h.isEndStream) reply.complete(GrpcReply(status, bytes))
                  case d: Http2DataFrame =>
                    bytes += d.content.readableBytes
                    if (d.isEndStream) reply.complete(GrpcReply(status, bytes))
                  case _ => ()
                }
            })
        })
        .open().sync().getNow
      val headers = new DefaultHttp2Headers()
        .method("POST").scheme("http").authority(s"127.0.0.1:$port").path(path)
      headers.set("content-type", "application/grpc")
      headers.set("te", "trailers")
      extraHeaders.foreach { case (k, v) => headers.set(k, v) }
      stream.write(new DefaultHttp2HeadersFrame(headers))
      stream.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(body), true))
      val out = reply.get(30, TimeUnit.SECONDS)
      conn.close().sync()
      out
    } finally group.shutdownGracefully()
  }

  test("unary Export over live h2c: frames parsed, rows spooled, grpc-status 0") {
    val spool = java.nio.file.Files.createTempDirectory("otlp_grpc_spool").toString
    val receiver = new OtlpReceiver(spark, spool)
    val grpc = receiver.grpc()
    val port = grpc.start()
    try {
      val reply = call(port,
        "/opentelemetry.proto.collector.logs.v1.LogsService/Export",
        grpcFrame(logsRequest))
      assert(reply.grpcStatus == 0, s"expected OK, got $reply")
      assert(reply.dataBytes == 5, "empty ExportLogsServiceResponse is one 5-byte frame")
      val spooled = spark.read.parquet(s"$spool/logs")
      assert(spooled.count() == 1)
      val row = spooled.head()
      assert(row.getAs[String]("body") == "grpc works")
      assert(row.getAs[String]("severity_text") == "INFO")
      assert(row.getAs[String]("scope_name") == "grpclogger")
    } finally grpc.stop()
  }

  test("gzip grpc-encoding (collector exporter default) is accepted") {
    val spool = java.nio.file.Files.createTempDirectory("otlp_grpc_gzip").toString
    val grpc = new OtlpReceiver(spark, spool).grpc()
    val port = grpc.start()
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(logsRequest); gz.close()
      val compressed = bos.toByteArray
      val frame = new java.io.ByteArrayOutputStream()
      frame.write(1) // compressed flag
      frame.write(java.nio.ByteBuffer.allocate(4).putInt(compressed.length).array())
      frame.write(compressed)
      val reply = call(port,
        "/opentelemetry.proto.collector.logs.v1.LogsService/Export",
        frame.toByteArray, Map("grpc-encoding" -> "gzip"))
      assert(reply.grpcStatus == 0, s"expected OK, got $reply")
      assert(spark.read.parquet(s"$spool/logs").head()
        .getAs[String]("body") == "grpc works")
    } finally grpc.stop()
  }

  test("export larger than the 64 KiB initial stream window completes") {
    // The client codec respects HTTP/2 flow control: past 65,535 body bytes
    // it sends nothing more until the server returns stream window credit.
    // A server that never issues mid-request stream WINDOW_UPDATEs
    // deadlocks here (this call then times out at 30 s). Note the eager
    // flush in OtlpGrpcServer is NOT what this guards (measured: a plain
    // write() also passes — Netty stream channels flush pending writes at
    // channelReadComplete); the guarded behavior is that consumed bytes
    // are credited back at all while the request is still in flight.
    val spool = java.nio.file.Files.createTempDirectory("otlp_grpc_big").toString
    val receiver = new OtlpReceiver(spark, spool)
    val grpc = receiver.grpc()
    val port = grpc.start()
    try {
      val bigBody = "x" * 200000
      val record = cat(
        f64(1, 1735725600000000000L),
        str(3, "INFO"),
        ld(5, str(1, bigBody)))
      val resource = ld(1, ld(1, cat(str(1, "service"), ld(2, str(1, "api")))))
      val request = ld(1, cat(resource,
        ld(2, cat(ld(1, str(1, "biglogger")), ld(2, record)))))
      assert(request.length > 65535, "request must exceed the initial stream window")
      val reply = call(port,
        "/opentelemetry.proto.collector.logs.v1.LogsService/Export",
        grpcFrame(request))
      assert(reply.grpcStatus == 0, s"expected OK, got $reply")
      assert(spark.read.parquet(s"$spool/logs").head()
        .getAs[String]("body") == bigBody)
    } finally grpc.stop()
  }

  test("gRPC status machine: unknown method and non-identity encoding rejected") {
    val spool = java.nio.file.Files.createTempDirectory("otlp_grpc_err").toString
    val grpc = new OtlpReceiver(spark, spool).grpc()
    val port = grpc.start()
    try {
      assert(call(port, "/no.such.Service/Export", grpcFrame(logsRequest))
        .grpcStatus == 12)
      assert(call(port, "/opentelemetry.proto.collector.logs.v1.LogsService/Export",
        grpcFrame(logsRequest), Map("grpc-encoding" -> "zstd")).grpcStatus == 12)
      assert(call(port, "/opentelemetry.proto.collector.logs.v1.LogsService/Export",
        Array[Byte](0, 0)).grpcStatus == 3)
    } finally grpc.stop()
  }
}
