#include "fastq.h"

#include <zlib.h>

#include <cstring>
#include <stdexcept>

namespace chimera {

std::vector<FastqRecord> ReadFastq(const std::string& path) {
  gzFile f = gzopen(path.c_str(), "rb");
  if (!f) throw std::runtime_error("cannot open " + path);
  gzbuffer(f, 1 << 20);
  std::vector<FastqRecord> out;
  std::string line;
  char buf[1 << 16];
  auto getline = [&](std::string* dst) -> bool {
    dst->clear();
    for (;;) {
      if (gzgets(f, buf, sizeof(buf)) == nullptr) return !dst->empty();
      dst->append(buf);
      if (!dst->empty() && dst->back() == '\n') {
        dst->pop_back();
        return true;
      }
    }
  };
  std::string header, seq, plus, qual;
  while (getline(&header)) {
    if (header.empty()) continue;
    if (header[0] != '@') throw std::runtime_error("bad FASTQ header: " + header);
    if (!getline(&seq) || !getline(&plus) || !getline(&qual))
      throw std::runtime_error("truncated FASTQ record");
    FastqRecord rec;
    size_t sp = header.find(' ');
    rec.name = header.substr(1, sp == std::string::npos ? std::string::npos : sp - 1);
    if (sp != std::string::npos) rec.comment = header.substr(sp + 1);
    rec.seq = std::move(seq);
    rec.qual = std::move(qual);
    out.push_back(std::move(rec));
  }
  gzclose(f);
  return out;
}

void WriteFastq(const std::vector<FastqRecord>& records, const std::string& path, int threads) {
  bool gz = path.size() > 3 && path.compare(path.size() - 3, 3, ".gz") == 0;
  auto emit = [&](auto&& write) {
    std::string block;
    block.reserve(1 << 20);
    for (const auto& r : records) {
      block += '@';
      block += r.name;
      if (!r.comment.empty()) {
        block += ' ';
        block += r.comment;
      }
      block += '\n';
      block += r.seq;
      block += "\n+\n";
      block += r.qual;
      block += '\n';
      if (block.size() > (1 << 20)) {
        write(block);
        block.clear();
      }
    }
    if (!block.empty()) write(block);
  };
  if (gz) {
    BgzfWriter w(path, threads);
    emit([&](const std::string& b) { w.Write(b.data(), b.size()); });
    w.Close();
  } else {
    FILE* f = std::fopen(path.c_str(), "wb");
    if (!f) throw std::runtime_error("cannot create " + path);
    emit([&](const std::string& b) { std::fwrite(b.data(), 1, b.size(), f); });
    std::fclose(f);
  }
}

}  // namespace chimera
