// gcv_facedet — native Haar-cascade face detector for genconvit_tpu.
//
// The reference detects faces with dlib HOG via face_recognition
// (ref: model/pred_func.py:67-92). No dlib model ships in this image, but
// the system OpenCV 4 C++ install carries the classic pretrained Haar
// cascades (/usr/share/opencv4/haarcascades) — real-face-trained classical
// detectors of the same family/era as dlib-HOG. The Python cv2 wheel here
// is OpenCV 5, which REMOVED the legacy CascadeClassifier binding, so this
// shim exposes the C++ objdetect API over a C ABI for ctypes
// (genconvit_tpu/data/faces.py HaarDetector).
//
// API: gcv_haar_create(path) -> handle; gcv_haar_detect(handle, gray
// frames [n,h,w] uint8, params, out rects (x,y,w,h) int32 + counts).
//
// Build: make -C native   (links opencv_core/imgproc/objdetect)

#include <algorithm>
#include <cstdint>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/objdetect.hpp>

extern "C" {

void* gcv_haar_create(const char* cascade_path) {
  auto* clf = new cv::CascadeClassifier();
  if (!clf->load(cascade_path)) {
    delete clf;
    return nullptr;
  }
  return clf;
}

void gcv_haar_destroy(void* handle) {
  delete static_cast<cv::CascadeClassifier*>(handle);
}

// Detect on a batch of grayscale frames.
//   gray:       [n, height, width] uint8, C-contiguous
//   out_rects:  [n, max_per, 4] int32 (x, y, w, h), caller-allocated
//   out_counts: [n] int32
// Returns 0 on success, -1 on bad handle.
int gcv_haar_detect(void* handle, const uint8_t* gray, int n, int height,
                    int width, double scale_factor, int min_neighbors,
                    int min_size, int32_t* out_rects, int32_t* out_counts,
                    int max_per) {
  auto* clf = static_cast<cv::CascadeClassifier*>(handle);
  if (clf == nullptr || clf->empty()) return -1;
  const size_t stride = static_cast<size_t>(height) * width;
  for (int i = 0; i < n; ++i) {
    // Mat over caller memory (no copy); detectMultiScale never mutates it.
    cv::Mat frame(height, width, CV_8UC1,
                  const_cast<uint8_t*>(gray + i * stride));
    std::vector<cv::Rect> rects;
    clf->detectMultiScale(frame, rects, scale_factor, min_neighbors, 0,
                          cv::Size(min_size, min_size));
    int count = static_cast<int>(rects.size());
    if (count > max_per) count = max_per;
    out_counts[i] = count;
    int32_t* out = out_rects + static_cast<size_t>(i) * max_per * 4;
    for (int j = 0; j < count; ++j) {
      out[j * 4 + 0] = rects[j].x;
      out[j * 4 + 1] = rects[j].y;
      out[j * 4 + 2] = rects[j].width;
      out[j * 4 + 3] = rects[j].height;
    }
  }
  return 0;
}

// Like gcv_haar_detect, but also returns per-detection confidences
// (detectMultiScale outputRejectLevels=true levelWeights: the final-stage
// classifier margin — the confidence signal cv2's detectMultiScale3
// exposed before the 5.x wheel dropped CascadeClassifier). Detections are
// written in descending-weight order so a truncated max_per keeps the
// most confident ones.
//   out_weights: [n, max_per] float64, caller-allocated
int gcv_haar_detect_scored(void* handle, const uint8_t* gray, int n,
                           int height, int width, double scale_factor,
                           int min_neighbors, int min_size,
                           int32_t* out_rects, double* out_weights,
                           int32_t* out_counts, int max_per) {
  auto* clf = static_cast<cv::CascadeClassifier*>(handle);
  if (clf == nullptr || clf->empty()) return -1;
  const size_t stride = static_cast<size_t>(height) * width;
  for (int i = 0; i < n; ++i) {
    cv::Mat frame(height, width, CV_8UC1,
                  const_cast<uint8_t*>(gray + i * stride));
    std::vector<cv::Rect> rects;
    std::vector<int> levels;
    std::vector<double> weights;
    clf->detectMultiScale(frame, rects, levels, weights, scale_factor,
                          min_neighbors, 0, cv::Size(min_size, min_size),
                          cv::Size(), /*outputRejectLevels=*/true);
    std::vector<int> order(rects.size());
    for (size_t j = 0; j < order.size(); ++j) order[j] = static_cast<int>(j);
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return weights[a] > weights[b]; });
    int count = static_cast<int>(rects.size());
    if (count > max_per) count = max_per;
    out_counts[i] = count;
    int32_t* out = out_rects + static_cast<size_t>(i) * max_per * 4;
    double* ow = out_weights + static_cast<size_t>(i) * max_per;
    for (int j = 0; j < count; ++j) {
      const cv::Rect& r = rects[order[j]];
      out[j * 4 + 0] = r.x;
      out[j * 4 + 1] = r.y;
      out[j * 4 + 2] = r.width;
      out[j * 4 + 3] = r.height;
      ow[j] = weights[order[j]];
    }
  }
  return 0;
}

}  // extern "C"
