// Shim btllib/order_queue.hpp: an order-preserving MPMC block queue with the
// API surface used by read_hashing.{cpp,hpp} and goldrush_path.cpp:1210-1256.
// Blocks are delivered to the consumer in strictly increasing `num` order.
// The companion SeqReader shim uses block_size == 1, so every reader block
// num is written exactly once and ordering is total (see seq_reader.hpp).
#ifndef SHIM_BTLLIB_ORDER_QUEUE_HPP
#define SHIM_BTLLIB_ORDER_QUEUE_HPP

#include <condition_variable>
#include <cstddef>
#include <map>
#include <mutex>
#include <vector>

namespace btllib {

template<typename T>
class OrderQueueMPMC
{
public:
  struct Block
  {
    std::vector<T> data;
    size_t count = 0;
    size_t num = 0;

    explicit Block(size_t block_size)
      : data(block_size)
    {}
    Block() = default;
  };

  OrderQueueMPMC(size_t buffer_size, size_t block_size)
    : m_block_size(block_size)
  {
    (void)buffer_size;
  }

  void write(Block& block)
  {
    std::unique_lock<std::mutex> lk(m_mutex);
    m_blocks.emplace(block.num, block);
    m_cv.notify_all();
  }

  void read(Block& block)
  {
    std::unique_lock<std::mutex> lk(m_mutex);
    m_cv.wait(lk, [&] {
      return !m_blocks.empty() && m_blocks.begin()->first == m_next;
    });
    block = m_blocks.begin()->second;
    m_blocks.erase(m_blocks.begin());
    ++m_next;
  }

private:
  size_t m_block_size;
  std::mutex m_mutex;
  std::condition_variable m_cv;
  std::map<size_t, Block> m_blocks;
  size_t m_next = 0;
};

} // namespace btllib

#endif
