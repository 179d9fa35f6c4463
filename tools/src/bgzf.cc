#include "bgzf.h"

#include <zlib.h>

#include <cstring>

namespace chimera {

static const uint8_t kEof[28] = {0x1f, 0x8b, 0x08, 0x04, 0,    0,    0,    0,    0,   0xff,
                                 0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0,
                                 0,    0,    0,    0,    0,    0,    0,    0};

std::vector<uint8_t> InflateBlock(const uint8_t* block, size_t len) {
  if (len < 26) throw std::runtime_error("short BGZF block");
  uint32_t isize;
  std::memcpy(&isize, block + len - 4, 4);
  std::vector<uint8_t> out(isize);
  if (isize == 0) return out;
  z_stream zs{};
  if (inflateInit2(&zs, -15) != Z_OK) throw std::runtime_error("inflateInit2");
  zs.next_in = const_cast<uint8_t*>(block) + 18;
  zs.avail_in = static_cast<uInt>(len - 18 - 8);
  zs.next_out = out.data();
  zs.avail_out = static_cast<uInt>(out.size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (rc != Z_STREAM_END) throw std::runtime_error("inflate failed");
  return out;
}

std::vector<uint8_t> DeflateBlock(const uint8_t* payload, size_t len, int level) {
  std::vector<uint8_t> comp(len + len / 2 + 64);
  z_stream zs{};
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) != Z_OK)
    throw std::runtime_error("deflateInit2");
  zs.next_in = const_cast<uint8_t*>(payload);
  zs.avail_in = static_cast<uInt>(len);
  zs.next_out = comp.data();
  zs.avail_out = static_cast<uInt>(comp.size());
  int rc = deflate(&zs, Z_FINISH);
  deflateEnd(&zs);
  if (rc != Z_STREAM_END) throw std::runtime_error("deflate failed");
  size_t clen = comp.size() - zs.avail_out;

  std::vector<uint8_t> block(12 + 6 + clen + 8);
  uint8_t* p = block.data();
  const uint8_t hdr[12] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff, 6, 0};
  std::memcpy(p, hdr, 12);
  p += 12;
  p[0] = 66;  // 'B'
  p[1] = 67;  // 'C'
  p[2] = 2;
  p[3] = 0;
  uint16_t bsize = static_cast<uint16_t>(clen + 25);
  std::memcpy(p + 4, &bsize, 2);
  p += 6;
  std::memcpy(p, comp.data(), clen);
  p += clen;
  uint32_t crc = crc32(0, payload, static_cast<uInt>(len));
  uint32_t ilen = static_cast<uint32_t>(len);
  std::memcpy(p, &crc, 4);
  std::memcpy(p + 4, &ilen, 4);
  return block;
}

BgzfReader::BgzfReader(const std::string& path, int threads, int readahead)
    : pool_(threads), readahead_(readahead) {
  fp_ = std::fopen(path.c_str(), "rb");
  if (!fp_) throw std::runtime_error("cannot open " + path);
}

BgzfReader::~BgzfReader() {
  if (fp_) std::fclose(fp_);
}

void BgzfReader::FillPipeline() {
  while (!eof_ && static_cast<int>(pending_.size()) < readahead_) {
    uint64_t coffset = static_cast<uint64_t>(std::ftell(fp_));
    uint8_t hdr[12];
    size_t got = std::fread(hdr, 1, 12, fp_);
    if (got == 0) {
      eof_ = true;
      break;
    }
    if (got < 12 || hdr[0] != 0x1f || hdr[1] != 0x8b || !(hdr[3] & 4))
      throw std::runtime_error("not a BGZF block");
    uint16_t xlen;
    std::memcpy(&xlen, hdr + 10, 2);
    std::vector<uint8_t> extra(xlen);
    if (std::fread(extra.data(), 1, xlen, fp_) != xlen) throw std::runtime_error("truncated BGZF");
    int bsize = -1;
    for (size_t off = 0; off + 4 <= extra.size();) {
      uint8_t si1 = extra[off], si2 = extra[off + 1];
      uint16_t slen;
      std::memcpy(&slen, extra.data() + off + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t v;
        std::memcpy(&v, extra.data() + off + 4, 2);
        bsize = v;
      }
      off += 4 + slen;
    }
    if (bsize < 0) throw std::runtime_error("missing BGZF BSIZE");
    size_t rest = static_cast<size_t>(bsize) + 1 - 12 - xlen;
    std::vector<uint8_t> block(12 + xlen + rest);
    std::memcpy(block.data(), hdr, 12);
    std::memcpy(block.data() + 12, extra.data(), xlen);
    if (std::fread(block.data() + 12 + xlen, 1, rest, fp_) != rest)
      throw std::runtime_error("truncated BGZF block");
    auto blk = std::make_shared<std::vector<uint8_t>>(std::move(block));
    pending_.emplace_back(coffset, pool_.submit([blk] {
      return InflateBlock(blk->data(), blk->size());
    }));
  }
}

bool BgzfReader::NextBlock() {
  for (;;) {
    FillPipeline();
    if (pending_.empty()) return false;
    auto item = std::move(pending_.front());
    pending_.pop_front();
    auto data = item.second.get();
    if (data.empty()) continue;  // EOF marker block
    buf_ = std::move(data);
    buf_pos_ = 0;
    block_coffset_ = item.first;
    return true;
  }
}

size_t BgzfReader::Read(void* dst, size_t n) {
  uint8_t* out = static_cast<uint8_t*>(dst);
  size_t total = 0;
  while (n > 0) {
    if (buf_pos_ >= buf_.size()) {
      if (!NextBlock()) break;
    }
    size_t take = std::min(n, buf_.size() - buf_pos_);
    std::memcpy(out, buf_.data() + buf_pos_, take);
    buf_pos_ += take;
    out += take;
    total += take;
    n -= take;
  }
  return total;
}

bool BgzfReader::ReadExact(void* dst, size_t n) { return Read(dst, n) == n; }

uint64_t BgzfReader::VirtualOffset() {
  if (buf_pos_ >= buf_.size()) {
    FillPipeline();
    if (!pending_.empty()) return pending_.front().first << 16;
    return static_cast<uint64_t>(std::ftell(fp_)) << 16;
  }
  return (block_coffset_ << 16) | static_cast<uint64_t>(buf_pos_);
}

BgzfWriter::BgzfWriter(const std::string& path, int threads, int level)
    : pool_(threads), level_(level) {
  fp_ = std::fopen(path.c_str(), "wb");
  if (!fp_) throw std::runtime_error("cannot create " + path);
  buf_.reserve(65536);
}

BgzfWriter::~BgzfWriter() { Close(); }

void BgzfWriter::Drain(size_t limit) {
  while (inflight_.size() > limit) {
    auto blk = inflight_.front().get();
    inflight_.pop_front();
    std::fwrite(blk.data(), 1, blk.size(), fp_);
  }
}

void BgzfWriter::Emit(std::vector<uint8_t> payload) {
  auto data = std::make_shared<std::vector<uint8_t>>(std::move(payload));
  int level = level_;
  inflight_.push_back(pool_.submit([data, level] {
    return DeflateBlock(data->data(), data->size(), level);
  }));
  Drain(128);
}

void BgzfWriter::Write(const void* src, size_t n) {
  const uint8_t* p = static_cast<const uint8_t*>(src);
  const size_t target = 65280;
  while (n > 0) {
    size_t take = std::min(n, target - buf_.size());
    buf_.insert(buf_.end(), p, p + take);
    p += take;
    n -= take;
    if (buf_.size() >= target) {
      Emit(std::move(buf_));
      buf_.clear();
      buf_.reserve(target);
    }
  }
}

void BgzfWriter::Close() {
  if (closed_) return;
  closed_ = true;
  if (!buf_.empty()) {
    Emit(std::move(buf_));
    buf_.clear();
  }
  Drain(0);
  std::fwrite(kEof, 1, sizeof(kEof), fp_);
  std::fclose(fp_);
  fp_ = nullptr;
}

}  // namespace chimera
