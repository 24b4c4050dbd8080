package graft.sources

import java.net.InetSocketAddress

import io.netty.bootstrap.ServerBootstrap
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer, MultiThreadIoEventLoopGroup, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2._

/** OTLP/gRPC receiver — the reference's primary OTLP transport
  * (glassflow-api/internal/otlp-receiver/server/grpc/), served here as
  * HTTP/2 cleartext (h2c, prior knowledge — what stock `otlp` gRPC
  * exporters speak on an insecure endpoint) on Netty's HTTP/2 frame codec,
  * which ships inside Spark's own distribution — zero added dependencies.
  *
  * gRPC-the-protocol at this surface is small and fully specified: a unary
  * Export call is one h2 stream carrying `POST
  * /opentelemetry.proto.collector.<signal>.v1.<Sig>Service/Export` with
  * `content-type: application/grpc`, a body of length-prefixed messages
  * (1-byte compressed flag + 4-byte big-endian length + protobuf), and a
  * response of the same shape terminated by `grpc-status` trailers. HPACK,
  * flow control, and stream multiplexing — the parts that make HTTP/2 hard
  * — come from Netty's codec; this class only speaks the gRPC framing and
  * hands the protobuf payload to the same decode → flatten → spool path
  * the HTTP transport uses ([[OtlpReceiver.ingestProtobuf]]).
  *
  * Scope: unary Export only (all three signals). Request `grpc-encoding:
  * gzip` is accepted — the collector's exporter compresses by default —
  * other codings are rejected with UNIMPLEMENTED(12) as the gRPC spec
  * directs; responses are always identity. TLS stays out of scope as on
  * the HTTP side.
  */
final class OtlpGrpcServer(ingest: (String, Array[Byte]) => Long) {

  private var group: MultiThreadIoEventLoopGroup = _
  private var channel: Channel = _

  def start(port: Int = 0): Int = {
    group = new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())
    val b = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        def initChannel(ch: SocketChannel): Unit =
          ch.pipeline.addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Channel] {
              def initChannel(stream: Channel): Unit =
                stream.pipeline.addLast(new StreamHandler)
            }))
      })
    channel = b.bind(new InetSocketAddress("127.0.0.1", port)).sync().channel()
    channel.localAddress.asInstanceOf[InetSocketAddress].getPort
  }

  def stop(): Unit = {
    if (channel != null) channel.close().sync()
    if (group != null) group.shutdownGracefully().sync()
  }

  private val SignalByPath = Map(
    "/opentelemetry.proto.collector.logs.v1.LogsService/Export" -> "logs",
    "/opentelemetry.proto.collector.trace.v1.TraceService/Export" -> "traces",
    "/opentelemetry.proto.collector.metrics.v1.MetricsService/Export" -> "metrics")

  /** One handler instance per h2 stream (the multiplexer makes each stream
    * a child channel, so plain mutable state is single-threaded here). */
  private final class StreamHandler extends SimpleChannelInboundHandler[Http2StreamFrame] {
    private var path = ""
    private var encoding = "identity"
    private val body = new java.io.ByteArrayOutputStream()

    override def channelRead0(ctx: ChannelHandlerContext, frame: Http2StreamFrame): Unit =
      frame match {
        case h: Http2HeadersFrame =>
          path = String.valueOf(h.headers.path)
          val enc = h.headers.get("grpc-encoding")
          if (enc != null) encoding = String.valueOf(enc)
          if (h.isEndStream) respond(ctx)
        case d: Http2DataFrame =>
          val content = d.content
          val chunk = new Array[Byte](content.readableBytes)
          content.readBytes(chunk)
          body.write(chunk)
          // return the consumed bytes to the flow-control window, or the
          // sender stalls after the initial 64 KiB. Flushing eagerly gets
          // the credit out in the same read loop; Netty's stream channel
          // would also flush a plain write() at channelReadComplete
          // (verified: the >64 KiB OtlpGrpcSpec case passes either way),
          // so the flush here buys latency, not correctness — but the
          // mid-request credit itself is load-bearing: without any
          // WINDOW_UPDATE the client deadlocks at 65,535 bytes.
          if (d.initialFlowControlledBytes > 0)
            ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(d.initialFlowControlledBytes))
          if (d.isEndStream) respond(ctx)
        case _ => ()
      }

    private def respond(ctx: ChannelHandlerContext): Unit =
      SignalByPath.get(path) match {
        case None =>
          trailersOnly(ctx, 12, s"unknown method: $path")
        case Some(_) if encoding != "identity" && encoding != "gzip" =>
          trailersOnly(ctx, 12, s"grpc-encoding $encoding not supported")
        case Some(signal) =>
          val bytes = body.toByteArray
          if (bytes.length < 5)
            trailersOnly(ctx, 3, "missing gRPC message frame")
          else if (bytes(0) != 0 && encoding == "identity")
            trailersOnly(ctx, 12, "compressed-flag set without grpc-encoding")
          else {
            val len = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
            if (len < 0 || 5 + len > bytes.length)
              trailersOnly(ctx, 3, s"message length $len exceeds body")
            else
              try {
                val msg = java.util.Arrays.copyOfRange(bytes, 5, 5 + len)
                // per-message compressed flag: gunzip only flagged messages
                ingest(signal, if (bytes(0) != 0) gunzip(msg) else msg)
                val headers = new DefaultHttp2Headers().status("200")
                headers.set("content-type", "application/grpc")
                ctx.write(new DefaultHttp2HeadersFrame(headers))
                // Export*ServiceResponse with no partial_success = fully
                // accepted; as protobuf that is the empty message
                val payload = ctx.alloc().buffer(5)
                payload.writeByte(0).writeInt(0)
                ctx.write(new DefaultHttp2DataFrame(payload))
                val trailers = new DefaultHttp2Headers()
                trailers.set("grpc-status", "0")
                ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
              } catch {
                case e: Exception =>
                  trailersOnly(ctx, 13, Option(e.getMessage).getOrElse(e.toString).take(200))
              }
          }
      }

    private def gunzip(bytes: Array[Byte]): Array[Byte] = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    }

    /** gRPC trailers-only error response: one HEADERS frame, end of stream. */
    private def trailersOnly(ctx: ChannelHandlerContext, status: Int, msg: String): Unit = {
      val headers = new DefaultHttp2Headers().status("200")
      headers.set("content-type", "application/grpc")
      headers.set("grpc-status", status.toString)
      headers.set("grpc-message", java.net.URLEncoder.encode(msg, "UTF-8"))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(headers, true))
    }
  }
}
