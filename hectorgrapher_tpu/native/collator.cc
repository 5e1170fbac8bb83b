// Native sensor collation queue.
//
// C++ twin of the reference's hot host-side path
// (ref: cartographer/sensor/internal/ordered_multi_queue.{h,cc} +
// common/blocking_queue.h): per-sensor FIFO queues merged into one
// monotonic time series. The ordering/merge logic runs natively; dispatch
// returns ready items to Python in batches so callback dispatch stays in
// the host language while the O(sensors * items) comparison loop is C++.
//
// Built as a plain CPython extension (no pybind11; see repo build notes).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <deque>
#include <limits>
#include <vector>

namespace {

struct Item {
  double time;
  PyObject* data;  // owned reference
};

struct Queue {
  std::deque<Item> items;
  bool finished = false;
};

struct MultiQueue {
  PyObject_HEAD
  std::vector<Queue>* queues;
  double last_dispatched_time;
  bool has_last;
};

extern PyTypeObject MultiQueueType;

PyObject* MultiQueue_new(PyTypeObject* type, PyObject*, PyObject*) {
  MultiQueue* self = reinterpret_cast<MultiQueue*>(type->tp_alloc(type, 0));
  if (self != nullptr) {
    self->queues = new std::vector<Queue>();
    self->last_dispatched_time = 0.0;
    self->has_last = false;
  }
  return reinterpret_cast<PyObject*>(self);
}

void MultiQueue_dealloc(MultiQueue* self) {
  if (self->queues != nullptr) {
    for (Queue& q : *self->queues) {
      for (Item& item : q.items) {
        Py_XDECREF(item.data);
      }
    }
    delete self->queues;
  }
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

// add_queue() -> int queue_id
PyObject* MultiQueue_add_queue(MultiQueue* self, PyObject*) {
  self->queues->emplace_back();
  return PyLong_FromSize_t(self->queues->size() - 1);
}

// add(queue_id, time, data)
PyObject* MultiQueue_add(MultiQueue* self, PyObject* args) {
  Py_ssize_t queue_id;
  double time;
  PyObject* data;
  if (!PyArg_ParseTuple(args, "ndO", &queue_id, &time, &data)) return nullptr;
  if (queue_id < 0 || static_cast<size_t>(queue_id) >= self->queues->size()) {
    PyErr_SetString(PyExc_IndexError, "unknown queue id");
    return nullptr;
  }
  Py_INCREF(data);
  (*self->queues)[queue_id].items.push_back(Item{time, data});
  Py_RETURN_NONE;
}

// mark_finished(queue_id)
PyObject* MultiQueue_mark_finished(MultiQueue* self, PyObject* args) {
  Py_ssize_t queue_id;
  if (!PyArg_ParseTuple(args, "n", &queue_id)) return nullptr;
  if (queue_id < 0 || static_cast<size_t>(queue_id) >= self->queues->size()) {
    PyErr_SetString(PyExc_IndexError, "unknown queue id");
    return nullptr;
  }
  (*self->queues)[queue_id].finished = true;
  Py_RETURN_NONE;
}

// dispatch() -> list[(queue_id, time, data)] of all currently-ready items.
PyObject* MultiQueue_dispatch(MultiQueue* self, PyObject*) {
  PyObject* out = PyList_New(0);
  if (out == nullptr) return nullptr;
  for (;;) {
    int best = -1;
    double best_time = std::numeric_limits<double>::infinity();
    bool blocked = false;
    for (size_t i = 0; i < self->queues->size(); ++i) {
      Queue& q = (*self->queues)[i];
      if (q.items.empty()) {
        if (!q.finished) {
          blocked = true;
          break;
        }
        continue;
      }
      if (q.items.front().time < best_time) {
        best_time = q.items.front().time;
        best = static_cast<int>(i);
      }
    }
    if (blocked || best < 0) break;
    Item item = (*self->queues)[best].items.front();
    (*self->queues)[best].items.pop_front();
    if (self->has_last && item.time < self->last_dispatched_time - 1e-9) {
      Py_DECREF(item.data);  // drop stale data (reference warns + skips)
      continue;
    }
    self->last_dispatched_time = item.time;
    self->has_last = true;
    PyObject* tuple = Py_BuildValue("(idN)", best, item.time, item.data);
    if (tuple == nullptr) {
      Py_DECREF(out);
      return nullptr;
    }
    if (PyList_Append(out, tuple) != 0) {
      Py_DECREF(tuple);
      Py_DECREF(out);
      return nullptr;
    }
    Py_DECREF(tuple);
  }
  return out;
}

// blocker() -> queue_id | None
PyObject* MultiQueue_blocker(MultiQueue* self, PyObject*) {
  for (size_t i = 0; i < self->queues->size(); ++i) {
    Queue& q = (*self->queues)[i];
    if (q.items.empty() && !q.finished) {
      return PyLong_FromSize_t(i);
    }
  }
  Py_RETURN_NONE;
}

PyMethodDef MultiQueue_methods[] = {
    {"add_queue", reinterpret_cast<PyCFunction>(MultiQueue_add_queue), METH_NOARGS, "Add a queue; returns its id."},
    {"add", reinterpret_cast<PyCFunction>(MultiQueue_add), METH_VARARGS, "Add (queue_id, time, data)."},
    {"mark_finished", reinterpret_cast<PyCFunction>(MultiQueue_mark_finished), METH_VARARGS, "Finish a queue."},
    {"dispatch", reinterpret_cast<PyCFunction>(MultiQueue_dispatch), METH_NOARGS, "Pop all ready items in time order."},
    {"blocker", reinterpret_cast<PyCFunction>(MultiQueue_blocker), METH_NOARGS, "Blocking queue id or None."},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject MultiQueueType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
    "hg_native.MultiQueue",          /* tp_name */
    sizeof(MultiQueue),              /* tp_basicsize */
    0,                               /* tp_itemsize */
    reinterpret_cast<destructor>(MultiQueue_dealloc), /* tp_dealloc */
};

PyModuleDef hg_native_module = {
    PyModuleDef_HEAD_INIT, "hg_native",
    "Native runtime components for hectorgrapher_tpu.", -1,
    nullptr, nullptr, nullptr, nullptr, nullptr};

}  // namespace

PyMODINIT_FUNC PyInit_hg_native(void) {
  MultiQueueType.tp_flags = Py_TPFLAGS_DEFAULT;
  MultiQueueType.tp_new = MultiQueue_new;
  MultiQueueType.tp_methods = MultiQueue_methods;
  if (PyType_Ready(&MultiQueueType) < 0) return nullptr;
  PyObject* m = PyModule_Create(&hg_native_module);
  if (m == nullptr) return nullptr;
  Py_INCREF(&MultiQueueType);
  if (PyModule_AddObject(m, "MultiQueue", reinterpret_cast<PyObject*>(&MultiQueueType)) < 0) {
    Py_DECREF(&MultiQueueType);
    Py_DECREF(m);
    return nullptr;
  }
  return m;
}
