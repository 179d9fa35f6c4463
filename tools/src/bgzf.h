// BGZF blocked-gzip reader/writer with a pipelined worker pool.
// TPU-native replacement for the reference's noodles bgzf::io::MultithreadedReader
// (reference: src/bin/extractsa.rs:50) built directly on zlib raw-deflate.
#pragma once

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <deque>
#include <functional>
#include <future>
#include <mutex>
#include <queue>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace chimera {

// Minimal fixed-size thread pool running arbitrary tasks.
class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    if (n < 1) n = 1;
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  template <typename F>
  auto submit(F&& f) -> std::future<decltype(f())> {
    using R = decltype(f());
    auto task = std::make_shared<std::packaged_task<R()>>(std::forward<F>(f));
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.emplace([task] { (*task)(); });
    }
    cv_.notify_one();
    return task->get_future();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

// Streaming BGZF reader: raw blocks are read sequentially, inflated on the
// pool, consumed in order.
class BgzfReader {
 public:
  BgzfReader(const std::string& path, int threads = 4, int readahead = 64);
  ~BgzfReader();

  // Read up to n bytes; returns bytes read (0 at EOF).
  size_t Read(void* dst, size_t n);
  bool ReadExact(void* dst, size_t n);
  // Virtual offset (coffset<<16 | uoffset) of the next byte.
  uint64_t VirtualOffset();

 private:
  bool NextBlock();
  void FillPipeline();

  FILE* fp_;
  ThreadPool pool_;
  int readahead_;
  std::deque<std::pair<uint64_t, std::future<std::vector<uint8_t>>>> pending_;
  std::vector<uint8_t> buf_;
  size_t buf_pos_ = 0;
  uint64_t block_coffset_ = 0;
  bool eof_ = false;
};

// BGZF writer with parallel deflate; blocks are emitted in order.
class BgzfWriter {
 public:
  BgzfWriter(const std::string& path, int threads = 4, int level = 6);
  ~BgzfWriter();
  void Write(const void* src, size_t n);
  void Close();

 private:
  void Emit(std::vector<uint8_t> payload);
  void Drain(size_t limit);

  FILE* fp_;
  ThreadPool pool_;
  int level_;
  std::vector<uint8_t> buf_;
  std::deque<std::future<std::vector<uint8_t>>> inflight_;
  bool closed_ = false;
};

std::vector<uint8_t> InflateBlock(const uint8_t* block, size_t len);
std::vector<uint8_t> DeflateBlock(const uint8_t* payload, size_t len, int level);

}  // namespace chimera
