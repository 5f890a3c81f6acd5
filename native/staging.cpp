// Native host-side staging pipeline: JPEG decode + bilinear resize +
// centered letterbox onto fixed canvases, in a thread pool.
//
// This is the TPU framework's replacement for the reference's native
// image path (PIL/libjpeg + OpenCV resize inside torch DataLoader
// workers; dataset/yolo_dataset_git.py:106-131). The Python loader calls
// stage_batch() via ctypes; each worker thread decodes one image and
// writes its staging canvas + placement metadata. Everything downstream
// (jitter/flip/HSV/mosaic/mixup) runs on the TPU (ops/augment.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC staging.cpp -ljpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file to RGB8. Returns false on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>* out, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB8 (src w0 x h0) -> (dst w1 x h1).
void resize_bilinear(const uint8_t* src, int w0, int h0, uint8_t* dst, int w1,
                     int h1) {
  const float sx = float(w0) / w1;
  const float sy = float(h0) / h1;
  for (int y = 0; y < h1; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, h0 - 1);
    int y1c = std::clamp(y0 + 1, 0, h0 - 1);
    for (int x = 0; x < w1; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = int(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, w0 - 1);
      int x1c = std::clamp(x0 + 1, 0, w0 - 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(size_t(y0c) * w0 + x0c) * 3 + c];
        float v01 = src[(size_t(y0c) * w0 + x1c) * 3 + c];
        float v10 = src[(size_t(y1c) * w0 + x0c) * 3 + c];
        float v11 = src[(size_t(y1c) * w0 + x1c) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(size_t(y) * w1 + x) * 3 + c] = uint8_t(std::lround(v));
      }
    }
  }
}

// Stage one image: decode -> aspect-preserving resize -> centered paste.
// canvas: size*size*3 u8 (pre-filled); meta: [iw, ih, r, ox, oy].
bool stage_one(const char* path, int size, uint8_t fill, uint8_t* canvas,
               float* meta) {
  std::vector<uint8_t> rgb;
  int iw = 0, ih = 0;
  if (!decode_jpeg(path, &rgb, &iw, &ih)) return false;
  float r = std::min(float(size) / iw, float(size) / ih);
  int nw = int(iw * r), nh = int(ih * r);
  nw = std::max(nw, 1);
  nh = std::max(nh, 1);
  int ox = (size - nw) / 2, oy = (size - nh) / 2;
  std::memset(canvas, fill, size_t(size) * size * 3);
  std::vector<uint8_t> resized(size_t(nw) * nh * 3);
  resize_bilinear(rgb.data(), iw, ih, resized.data(), nw, nh);
  for (int y = 0; y < nh; ++y) {
    std::memcpy(canvas + ((size_t(oy) + y) * size + ox) * 3,
                resized.data() + size_t(y) * nw * 3, size_t(nw) * 3);
  }
  meta[0] = float(iw);
  meta[1] = float(ih);
  meta[2] = r;
  meta[3] = float(ox);
  meta[4] = float(oy);
  return true;
}

}  // namespace

extern "C" {

// paths: n C strings; tiles: n*size*size*3 u8; metas: n*5 f32;
// ok: n u8 success flags. Returns the number of successes.
int stage_batch(const char** paths, int n, int size, uint8_t fill,
                uint8_t* tiles, float* metas, uint8_t* ok, int num_threads) {
  std::atomic<int> next(0), good(0);
  int nt = std::max(1, num_threads);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      bool r = stage_one(paths[i], size, fill,
                         tiles + size_t(i) * size * size * 3, metas + i * 5);
      ok[i] = r ? 1 : 0;
      if (r) good.fetch_add(1);
    }
  };
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return good.load();
}

}  // extern "C"
