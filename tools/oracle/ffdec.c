/* ffdec — decode a compressed audio file (OMA/EA3, RIFF .at3/.wav, RealMedia)
 * to raw interleaved float32 PCM using the system libavformat/libavcodec.
 *
 * This is the *independent third-party decoder oracle* for the encoders in
 * atracdenc_tpu: ffmpeg's ATRAC3 / ATRAC3+ decoders are the same decoders the
 * reference project relies on for quality verification (its own tree carries
 * ffmpeg-derived AT3P tables/DSP, reference: src/atrac/at3p/ff/ and the
 * integration-test notes in SURVEY.md §4).
 *
 * Usage: ffdec <in.oma|in.at3|in.wav|in.rm|in.aea> <out.f32>
 * Output: interleaved float32 in [-1, 1]; prints "channels rate samples" on
 * stdout.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>

static void die(const char *msg, int err)
{
    char buf[256] = {0};
    if (err)
        av_strerror(err, buf, sizeof(buf));
    fprintf(stderr, "ffdec: %s %s\n", msg, buf);
    exit(1);
}

int main(int argc, char **argv)
{
    if (argc != 3) {
        fprintf(stderr, "usage: ffdec <in> <out.f32>\n");
        return 2;
    }

    AVFormatContext *fmt = NULL;
    int err = avformat_open_input(&fmt, argv[1], NULL, NULL);
    if (err < 0)
        die("open_input", err);
    if ((err = avformat_find_stream_info(fmt, NULL)) < 0)
        die("find_stream_info", err);

    int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, NULL, 0);
    if (sidx < 0)
        die("no audio stream", sidx);
    AVStream *st = fmt->streams[sidx];

    const AVCodec *dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec)
        die("no decoder", 0);
    AVCodecContext *ctx = avcodec_alloc_context3(dec);
    avcodec_parameters_to_context(ctx, st->codecpar);
    if ((err = avcodec_open2(ctx, dec, NULL)) < 0)
        die("codec open", err);

    FILE *out = fopen(argv[2], "wb");
    if (!out)
        die("open output", 0);

    SwrContext *swr = NULL;
    long total = 0;
    int channels = 0, rate = 0;

    AVPacket *pkt = av_packet_alloc();
    AVFrame *frm = av_frame_alloc();
    int draining = 0;
    while (1) {
        if (!draining) {
            err = av_read_frame(fmt, pkt);
            if (err < 0) {
                draining = 1;
                avcodec_send_packet(ctx, NULL);
            } else if (pkt->stream_index != sidx) {
                av_packet_unref(pkt);
                continue;
            } else {
                err = avcodec_send_packet(ctx, pkt);
                av_packet_unref(pkt);
                if (err < 0 && err != AVERROR(EAGAIN))
                    die("send_packet", err);
            }
        }
        err = avcodec_receive_frame(ctx, frm);
        if (err == AVERROR(EAGAIN)) {
            if (draining)
                break;
            continue;
        }
        if (err == AVERROR_EOF)
            break;
        if (err < 0)
            die("receive_frame", err);

        if (!swr) {
            channels = frm->ch_layout.nb_channels;
            rate = frm->sample_rate;
            swr = swr_alloc();
            av_opt_set_chlayout(swr, "in_chlayout", &frm->ch_layout, 0);
            av_opt_set_chlayout(swr, "out_chlayout", &frm->ch_layout, 0);
            av_opt_set_int(swr, "in_sample_rate", rate, 0);
            av_opt_set_int(swr, "out_sample_rate", rate, 0);
            av_opt_set_sample_fmt(swr, "in_sample_fmt", frm->format, 0);
            av_opt_set_sample_fmt(swr, "out_sample_fmt", AV_SAMPLE_FMT_FLT, 0);
            if ((err = swr_init(swr)) < 0)
                die("swr_init", err);
        }
        uint8_t *buf = NULL;
        av_samples_alloc(&buf, NULL, channels, frm->nb_samples,
                         AV_SAMPLE_FMT_FLT, 0);
        int n = swr_convert(swr, &buf, frm->nb_samples,
                            (const uint8_t **)frm->extended_data,
                            frm->nb_samples);
        if (n < 0)
            die("swr_convert", n);
        fwrite(buf, sizeof(float) * channels, n, out);
        total += n;
        av_freep(&buf);
        av_frame_unref(frm);
    }

    fclose(out);
    printf("%d %d %ld\n", channels, rate, total);
    return 0;
}
