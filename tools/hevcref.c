/* hevcref — test oracle for the TPU-native HEVC engine.
 *
 * Thin wrapper over the system libavcodec (ffmpeg's independent HEVC
 * decoder + libx265 encoder).  Used ONLY by the test suite as an external
 * conformance reference (the analogue of checking against openHEVC, cf.
 * /root/reference/src/media/processing/openhevcfilter.cpp:38-199):
 *
 *   hevcref decode in.265 out.yuv          # Annex-B HEVC -> raw I420 frames
 *   hevcref encode in.yuv WxH QP out.265   # raw I420 -> HEVC via libx265 (golden streams)
 *
 * Build: gcc -O2 tools/hevcref.c -o tools/hevcref -lavcodec -lavutil
 */
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void die(const char *msg) { fprintf(stderr, "hevcref: %s\n", msg); exit(1); }

static void write_frame_i420(FILE *out, AVFrame *f) {
    /* 8-bit: 1 byte/sample; 10-bit (yuv420p10le): 2 bytes/sample LE */
    int bps = (f->format == AV_PIX_FMT_YUV420P10LE ||
               f->format == AV_PIX_FMT_YUV420P12LE ||
               f->format == AV_PIX_FMT_YUV420P9LE) ? 2 : 1;
    for (int y = 0; y < f->height; y++)
        fwrite(f->data[0] + (size_t)y * f->linesize[0], 1, (size_t)f->width * bps, out);
    for (int p = 1; p <= 2; p++)
        for (int y = 0; y < f->height / 2; y++)
            fwrite(f->data[p] + (size_t)y * f->linesize[p], 1, (size_t)f->width / 2 * bps, out);
}

static int do_decode(const char *inpath, const char *outpath) {
    FILE *fin = fopen(inpath, "rb");
    if (!fin) die("cannot open input");
    FILE *fout = fopen(outpath, "wb");
    if (!fout) die("cannot open output");

    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_HEVC);
    if (!codec) die("no HEVC decoder");
    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (avcodec_open2(ctx, codec, NULL) < 0) die("open decoder failed");

    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    int nframes = 0;

    fseek(fin, 0, SEEK_END);
    long size = ftell(fin);
    fseek(fin, 0, SEEK_SET);
    uint8_t *buf = malloc(size + AV_INPUT_BUFFER_PADDING_SIZE);
    if (fread(buf, 1, size, fin) != (size_t)size) die("short read");
    memset(buf + size, 0, AV_INPUT_BUFFER_PADDING_SIZE);

    uint8_t *data = buf;
    long remaining = size;
    int eof = 0;
    while (!eof || 1) {
        if (remaining == 0) eof = 1;
        int ret = av_parser_parse2(parser, ctx, &pkt->data, &pkt->size,
                                   data, remaining, AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
        if (ret < 0) die("parse error");
        data += ret; remaining -= ret;
        if (pkt->size) {
            if (avcodec_send_packet(ctx, pkt) < 0) die("send_packet failed");
            while (avcodec_receive_frame(ctx, frame) == 0) {
                write_frame_i420(fout, frame); nframes++;
            }
        } else if (eof) {
            break;
        }
    }
    /* flush decoder */
    avcodec_send_packet(ctx, NULL);
    while (avcodec_receive_frame(ctx, frame) == 0) { write_frame_i420(fout, frame); nframes++; }

    fprintf(stderr, "decoded %d frames %dx%d\n", nframes, ctx->width, ctx->height);
    fclose(fin); fclose(fout);
    return 0;
}

static int do_encode(const char *inpath, const char *dims, const char *qp, const char *outpath,
                     const char *extra_params) {
    int w, h;
    if (sscanf(dims, "%dx%d", &w, &h) != 2) die("bad WxH");
    const AVCodec *codec = avcodec_find_encoder_by_name("libx265");
    if (!codec) die("no libx265 encoder in this libavcodec");
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    ctx->width = w; ctx->height = h;
    ctx->time_base = (AVRational){1, 25};
    ctx->framerate = (AVRational){25, 1};
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    char params[512];
    snprintf(params, sizeof params, "qp=%s:%s", qp, extra_params ? extra_params : "");
    av_opt_set(ctx->priv_data, "x265-params", params, 0);
    if (avcodec_open2(ctx, codec, NULL) < 0) die("open libx265 failed");

    FILE *fin = fopen(inpath, "rb");
    if (!fin) die("cannot open input yuv");
    FILE *fout = fopen(outpath, "wb");
    AVFrame *frame = av_frame_alloc();
    frame->format = ctx->pix_fmt; frame->width = w; frame->height = h;
    av_frame_get_buffer(frame, 0);
    AVPacket *pkt = av_packet_alloc();
    size_t ysize = (size_t)w * h, csize = ysize / 4;
    int n = 0;
    for (;;) {
        av_frame_make_writable(frame);
        size_t got = 0;
        for (int y = 0; y < h; y++)
            got += fread(frame->data[0] + (size_t)y * frame->linesize[0], 1, w, fin);
        for (int p = 1; p <= 2; p++)
            for (int y = 0; y < h / 2; y++)
                got += fread(frame->data[p] + (size_t)y * frame->linesize[p], 1, w / 2, fin);
        if (got < ysize + 2 * csize) break;
        frame->pts = n++;
        avcodec_send_frame(ctx, frame);
        while (avcodec_receive_packet(ctx, pkt) == 0) {
            fwrite(pkt->data, 1, pkt->size, fout);
            av_packet_unref(pkt);
        }
    }
    avcodec_send_frame(ctx, NULL);
    while (avcodec_receive_packet(ctx, pkt) == 0) {
        fwrite(pkt->data, 1, pkt->size, fout);
        av_packet_unref(pkt);
    }
    fprintf(stderr, "encoded %d frames\n", n);
    fclose(fin); fclose(fout);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 4 && !strcmp(argv[1], "decode"))
        return do_decode(argv[2], argv[3]);
    if (argc >= 6 && !strcmp(argv[1], "encode"))
        return do_encode(argv[2], argv[3], argv[4], argv[5], argc > 6 ? argv[6] : NULL);
    fprintf(stderr, "usage: hevcref decode in.265 out.yuv | hevcref encode in.yuv WxH QP out.265 [x265params]\n");
    return 2;
}
