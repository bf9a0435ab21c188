// packio — memory-mapped packed-image dataset reader (CPython C API).
//
// TPU-native replacement for the reference's LMDB backend
// (/root/reference/neosr/data/file_client.py:26-70 + lmdb_util.py): training
// images are stored pre-decoded (uint8 HWC) in a single ".npack" file that
// is mmap'd once per process; random crops are copied row-wise straight out
// of the page cache into fresh numpy arrays with the GIL released.  On the
// 1-core hosts that drive TPU slices this removes the PNG/JPEG decode from
// the hot path entirely (the decode happens once, in tools/pack_dataset.py).
//
// File layout (little-endian):
//   magic  "NPK1"               4 bytes
//   count  uint64               number of images
//   index  count * 4 * uint64   (offset, h, w, c) per image
//   blobs  raw uint8 HWC pixel data
//
// Python API (module neosr_tpu._native.packio):
//   p = Pack(path)
//   len(p) -> int
//   p.shape(i) -> (h, w, c)
//   p.read(i) -> numpy uint8 (h, w, c)              [zero decode, one memcpy]
//   p.read_crop(i, top, left, ph, pw) -> numpy uint8 (ph, pw, c)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Entry {
  uint64_t offset;
  uint64_t h;
  uint64_t w;
  uint64_t c;
};

struct PackObject {
  PyObject_HEAD
  int fd;
  uint8_t* data;
  size_t size;
  uint64_t count;
  const Entry* index;   // points into the mapping
  const uint8_t* blobs; // base of pixel data (== data)
};

void Pack_dealloc(PackObject* self) {
  if (self->data != nullptr && self->data != MAP_FAILED) {
    munmap(self->data, self->size);
  }
  if (self->fd >= 0) close(self->fd);
  Py_TYPE(self)->tp_free((PyObject*)self);
}

int Pack_init(PackObject* self, PyObject* args, PyObject* kwds) {
  const char* path = nullptr;
  static const char* kwlist[] = {"path", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "s", (char**)kwlist, &path)) {
    return -1;
  }
  self->fd = open(path, O_RDONLY);
  if (self->fd < 0) {
    PyErr_Format(PyExc_OSError, "packio: cannot open %s", path);
    return -1;
  }
  struct stat st;
  if (fstat(self->fd, &st) != 0 || st.st_size < 12) {
    PyErr_Format(PyExc_OSError, "packio: bad file %s", path);
    return -1;
  }
  self->size = (size_t)st.st_size;
  self->data =
      (uint8_t*)mmap(nullptr, self->size, PROT_READ, MAP_SHARED, self->fd, 0);
  if (self->data == MAP_FAILED) {
    PyErr_Format(PyExc_OSError, "packio: mmap failed for %s", path);
    return -1;
  }
  if (memcmp(self->data, "NPK1", 4) != 0) {
    PyErr_Format(PyExc_ValueError, "packio: bad magic in %s", path);
    return -1;
  }
  memcpy(&self->count, self->data + 4, 8);
  size_t index_bytes = (size_t)self->count * sizeof(Entry);
  if (12 + index_bytes > self->size) {
    PyErr_Format(PyExc_ValueError, "packio: truncated index in %s", path);
    return -1;
  }
  self->index = (const Entry*)(self->data + 12);
  self->blobs = self->data;
  // advise the kernel we'll do random reads
  madvise(self->data, self->size, MADV_RANDOM);
  return 0;
}

Py_ssize_t Pack_len(PyObject* self_obj) {
  return (Py_ssize_t)((PackObject*)self_obj)->count;
}

bool check_idx(PackObject* self, Py_ssize_t i) {
  if (i < 0 || (uint64_t)i >= self->count) {
    PyErr_SetString(PyExc_IndexError, "packio: index out of range");
    return false;
  }
  return true;
}

PyObject* Pack_shape(PackObject* self, PyObject* args) {
  Py_ssize_t i;
  if (!PyArg_ParseTuple(args, "n", &i)) return nullptr;
  if (!check_idx(self, i)) return nullptr;
  const Entry& e = self->index[i];
  return Py_BuildValue("(KKK)", (unsigned long long)e.h,
                       (unsigned long long)e.w, (unsigned long long)e.c);
}

// builds a numpy array via the buffer protocol without linking numpy:
// create a bytes object, then numpy reshapes it python-side?  Instead we
// return (bytes, h, w, c) and let the thin python wrapper wrap it in
// numpy.frombuffer().reshape() — zero extra copies beyond the crop memcpy.
PyObject* Pack_read_crop(PackObject* self, PyObject* args) {
  Py_ssize_t i, top, left, ph, pw;
  if (!PyArg_ParseTuple(args, "nnnnn", &i, &top, &left, &ph, &pw)) return nullptr;
  if (!check_idx(self, i)) return nullptr;
  const Entry& e = self->index[i];
  if (top < 0 || left < 0 || (uint64_t)(top + ph) > e.h ||
      (uint64_t)(left + pw) > e.w || ph <= 0 || pw <= 0) {
    PyErr_SetString(PyExc_ValueError, "packio: crop out of bounds");
    return nullptr;
  }
  if (e.offset + e.h * e.w * e.c > self->size) {
    PyErr_SetString(PyExc_ValueError, "packio: blob out of bounds");
    return nullptr;
  }
  size_t row_bytes = (size_t)pw * e.c;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)(ph * row_bytes));
  if (!out) return nullptr;
  char* dst = PyBytes_AS_STRING(out);
  const uint8_t* base = self->blobs + e.offset;
  size_t src_stride = (size_t)e.w * e.c;
  const uint8_t* src = base + (size_t)top * src_stride + (size_t)left * e.c;
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t r = 0; r < ph; ++r) {
    memcpy(dst + (size_t)r * row_bytes, src + (size_t)r * src_stride, row_bytes);
  }
  Py_END_ALLOW_THREADS
  return Py_BuildValue("(NKKK)", out, (unsigned long long)ph,
                       (unsigned long long)pw, (unsigned long long)e.c);
}

PyObject* Pack_read(PackObject* self, PyObject* args) {
  Py_ssize_t i;
  if (!PyArg_ParseTuple(args, "n", &i)) return nullptr;
  if (!check_idx(self, i)) return nullptr;
  const Entry& e = self->index[i];
  PyObject* crop_args = Py_BuildValue("(nnnnn)", i, (Py_ssize_t)0, (Py_ssize_t)0,
                                      (Py_ssize_t)e.h, (Py_ssize_t)e.w);
  PyObject* res = Pack_read_crop(self, crop_args);
  Py_DECREF(crop_args);
  return res;
}

PyMethodDef Pack_methods[] = {
    {"shape", (PyCFunction)Pack_shape, METH_VARARGS, "shape(i) -> (h, w, c)"},
    {"read", (PyCFunction)Pack_read, METH_VARARGS,
     "read(i) -> (bytes, h, w, c)"},
    {"read_crop", (PyCFunction)Pack_read_crop, METH_VARARGS,
     "read_crop(i, top, left, ph, pw) -> (bytes, ph, pw, c)"},
    {nullptr, nullptr, 0, nullptr}};

PySequenceMethods Pack_as_sequence = {
    Pack_len, /* sq_length */
};

PyTypeObject PackType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

PyModuleDef packio_module = {
    PyModuleDef_HEAD_INIT, "packio",
    "mmap'd packed-image dataset reader", -1, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_packio(void) {
  PackType.tp_name = "packio.Pack";
  PackType.tp_basicsize = sizeof(PackObject);
  PackType.tp_dealloc = (destructor)Pack_dealloc;
  PackType.tp_flags = Py_TPFLAGS_DEFAULT;
  PackType.tp_doc = "mmap'd image pack";
  PackType.tp_methods = Pack_methods;
  PackType.tp_init = (initproc)Pack_init;
  PackType.tp_new = PyType_GenericNew;
  PackType.tp_as_sequence = &Pack_as_sequence;
  if (PyType_Ready(&PackType) < 0) return nullptr;
  PyObject* m = PyModule_Create(&packio_module);
  if (!m) return nullptr;
  Py_INCREF(&PackType);
  PyModule_AddObject(m, "Pack", (PyObject*)&PackType);
  return m;
}
